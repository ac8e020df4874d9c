"""Ray Data batch transforms (tasks) and actor-pool stages."""
