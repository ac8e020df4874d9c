"""Validation checkpoints A and B — deterministic actor-pool stages.

The reference's validators are LLM judges with deterministic fallbacks
(Checkpoint A: ``/root/reference/src/agents/validation.py:79-302``;
Checkpoint B: ``validation.py:335-554`` via DSPy at temperature 0,
falling back to accept-with-0.5 on failure, ``validation.py:508-517``).
Model weights don't exist here, so the judges are deterministic
rule-based scorers with the same record shapes and the same accept /
correct / discard control flow (``pipeline.py:255-319``):

* Checkpoint A (per chunk): structural checks — empty structured_text,
  truncation artifacts, kind/text consistency, offset sanity.  Verdict
  score starts at 1.0 and loses fixed penalties per issue; chunks
  scoring below ``discard_below`` are dropped, failing-but-fixable
  chunks get a corrected confidence (reference "corrected" path).
* Checkpoint B (per answer): grounding = token containment of the
  answer in the retrieved source texts; tokens absent from all sources
  are reported as hallucinations (the reference's seeded-hallucination
  test, ``tests/test_dspy_validator.py:33-212``, is reproduced in our
  tests).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

from ..util import default_actor_pool

_WORD_RE = re.compile(r"[A-Za-z0-9]+")

ACCEPT = "accepted"
CORRECTED = "corrected"
DISCARDED = "discarded"


class ChunkValidator:
    """Checkpoint A as a callable-class stage (actor pool)."""

    def __init__(self, discard_below: float = 0.25) -> None:
        self.discard_below = discard_below

    def _judge(self, kind: str, text: str, confidence: float) -> tuple[float, list[str]]:
        issues = []
        score = 1.0
        if not (text or "").strip():
            if kind != "figure":
                issues.append("empty structured_text")
                score -= 0.8  # below the discard floor on its own
        if kind == "table" and "|" not in (text or ""):
            issues.append("table chunk without table markup")
            score -= 0.3
        if len(text or "") >= 2000:
            issues.append("truncated at 2000 chars")
            score -= 0.1
        if confidence < 0.5:
            issues.append("low extraction confidence")
            score -= 0.2
        return max(score, 0.0), issues

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scores, outcomes, issue_strs, new_conf = [], [], [], []
        for kind, text, conf in zip(
            batch["kind"], batch["structured_text"], batch["confidence"]
        ):
            s, issues = self._judge(kind, text or "", float(conf))
            scores.append(np.float32(s))
            issue_strs.append("; ".join(issues))
            if s < self.discard_below:
                outcomes.append(DISCARDED)
                new_conf.append(np.float32(conf))
            elif issues:
                outcomes.append(CORRECTED)
                new_conf.append(np.float32(min(float(conf), s)))
            else:
                outcomes.append(ACCEPT)
                new_conf.append(np.float32(conf))
        batch = batch.copy()
        batch["verdict_score"] = scores
        batch["validation_outcome"] = outcomes
        batch["validation_issues"] = issue_strs
        batch["confidence"] = new_conf
        return batch


def validate_chunks(chunks: rd.Dataset, discard_below: float = 0.25,
                    concurrency=None) -> rd.Dataset:
    """Checkpoint A over a chunk Dataset; discarded rows are filtered
    (the reference's accept/correct/discard loop, vectorized)."""
    if concurrency is None:
        concurrency = default_actor_pool()
    judged = chunks.map_batches(
        ChunkValidator,
        fn_constructor_args=(discard_below,),
        batch_format="pandas",
        concurrency=concurrency,
    )
    return judged.map_batches(
        lambda b: b[b["validation_outcome"] != DISCARDED],
        batch_format="pandas",
    )


def ground_answer(answer: str, source_texts: list[str]) -> dict:
    """Checkpoint B: token-containment grounding verdict.

    Returns the reference AnswerValidationResult shape
    (``models.py:77-96``): is_grounded, hallucinations, verdict_score,
    notes.  Numbers and rare tokens in the answer that appear in no
    source are hallucination evidence.
    """
    src_tokens = set()
    for s in source_texts:
        src_tokens.update(w.lower() for w in _WORD_RE.findall(s or ""))
    ans_tokens = [w for w in _WORD_RE.findall(answer or "")]
    content = [w for w in ans_tokens if len(w) > 3 or w.isdigit()]
    missing = sorted({w.lower() for w in content} - src_tokens)
    score = 1.0 if not content else 1.0 - len(missing) / len({w.lower() for w in content})
    return {
        "is_grounded": len(missing) == 0,
        "hallucinations": missing,
        "verdict_score": round(score, 6),
        "notes": "token-containment grounding check (deterministic)",
    }
