"""Extension-query aggregator.

The 184 training-data-pipeline queries live in themed modules
(queries_text/dedup/similarity/multimodal/events/streaming/warehouse/
sampling/graph/curation, sharing helpers via queries_shared); importing
this module imports them all and then restores the frozen registration
order from registry_order.CANONICAL_ORDER — the driver's correctness
snapshot keys on the first 50 names of the registry, so thematic
regrouping must never change the externally visible order. The split
and this order shim replaced the former 8.8k-line monolith in round 4.
"""

from __future__ import annotations

import covid_data_challenge_spark.queries  # noqa: F401 — the 27 parity queries register first
import covid_data_challenge_spark.queries_text  # noqa: F401,E402
import covid_data_challenge_spark.queries_dedup  # noqa: F401,E402
import covid_data_challenge_spark.queries_similarity  # noqa: F401,E402
import covid_data_challenge_spark.queries_multimodal  # noqa: F401,E402
import covid_data_challenge_spark.queries_events  # noqa: F401,E402
import covid_data_challenge_spark.queries_streaming  # noqa: F401,E402
import covid_data_challenge_spark.queries_warehouse  # noqa: F401,E402
import covid_data_challenge_spark.queries_sampling  # noqa: F401,E402
import covid_data_challenge_spark.queries_graph  # noqa: F401,E402
import covid_data_challenge_spark.queries_curation  # noqa: F401,E402
import covid_data_challenge_spark.queries_preference  # noqa: F401,E402

from covid_data_challenge_spark.registry import REGISTRY
from covid_data_challenge_spark.registry_order import CANONICAL_ORDER

# re-exported for tests/tools that address helpers through this module
from covid_data_challenge_spark.operators.dedup import jaccard_pairs  # noqa: F401,E402
from covid_data_challenge_spark.queries_shared import (  # noqa: F401,E402
    _NORM,
    _docs,
    _emb,
    _events,
)
from covid_data_challenge_spark.queries_streaming import _CDC_INS_OFFSET  # noqa: F401,E402


def _restore_canonical_order() -> None:
    snap = dict(REGISTRY)
    missing = [n for n in CANONICAL_ORDER if n not in snap]
    if missing:
        raise RuntimeError(f"registry lost frozen queries: {missing}")
    REGISTRY.clear()
    for name in CANONICAL_ORDER:
        REGISTRY[name] = snap.pop(name)
    REGISTRY.update(snap)  # post-freeze additions keep module import order


_restore_canonical_order()
