"""Pipeline step registry — the engine's user-extension surface.

Ray-native equivalent of the reference's agent plug-in points and
multiple orchestrations (SURVEY.md §2.9: subclass hooks in
``src/agents/base.py:28-110``, the three interchangeable
orchestrations of the same operators): a pipeline is an ordered list
of named steps, each a function or callable class with its own batch
size / resources, composed into one lazy Dataset chain.

    reg = StepRegistry()
    reg.register("parse", PayloadParser, batch_format="pyarrow",
                 batch_size=128, concurrency=4)
    reg.register("chunks", transform_chunks_batch, batch_format="pandas")
    ds_out = reg.build(ds_in, steps=["parse", "chunks"])
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any

import ray.data as rd


@dataclass
class Step:
    name: str
    fn: Any
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: Any = None
    num_cpus: float | None = None
    fn_kwargs: dict = field(default_factory=dict)

    @property
    def is_class(self) -> bool:
        return inspect.isclass(self.fn)


class StepRegistry:
    def __init__(self) -> None:
        self._steps: dict[str, Step] = {}

    def register(self, name: str, fn: Any, **opts: Any) -> "StepRegistry":
        self._steps[name] = Step(name=name, fn=fn, **opts)
        return self

    def names(self) -> list[str]:
        return list(self._steps)

    def build(self, ds: rd.Dataset, steps: list[str] | None = None) -> rd.Dataset:
        for name in steps or self.names():
            s = self._steps[name]
            kwargs: dict[str, Any] = {"batch_format": s.batch_format}
            if s.batch_size is not None:
                kwargs["batch_size"] = s.batch_size
            if s.num_cpus is not None:
                kwargs["num_cpus"] = s.num_cpus
            if s.is_class:
                kwargs["concurrency"] = s.concurrency or 2
                if s.fn_kwargs:
                    kwargs["fn_constructor_kwargs"] = s.fn_kwargs
                ds = ds.map_batches(s.fn, **kwargs)
            else:
                fn = s.fn
                if s.fn_kwargs:
                    captured = dict(s.fn_kwargs)

                    def fn(batch, _f=s.fn, _kw=captured):
                        return _f(batch, **_kw)

                if s.concurrency is not None:
                    kwargs["concurrency"] = s.concurrency
                ds = ds.map_batches(fn, **kwargs)
        return ds
