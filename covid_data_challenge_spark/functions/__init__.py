from covid_data_challenge_spark.functions.scalar import (
    guarded_div,
    pct_gap,
    per_100k,
    clip_lower,
    fill_zero,
    search_contains,
)

__all__ = [
    "guarded_div",
    "pct_gap",
    "per_100k",
    "clip_lower",
    "fill_zero",
    "search_contains",
]
