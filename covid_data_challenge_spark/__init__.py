"""covid_data_challenge_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the ``lfaller/covid-data-challenge`` reference pipeline
(multi-source integration: scan → standardize → profile → time-series
features → latest-per-key alignment → join → derived metrics → analytics
queries), extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design stance (see SURVEY.md):
- Declarative DataFrame plans everywhere; Catalyst + AQE pick the physical
  strategy. No RDDs, no row-at-a-time Python UDFs on the parity surface.
- Explicit schemas for external sources; lazy end-to-end; shuffles only at
  keyed aggregations/joins; broadcast for small dimensions.
- Built to run unchanged on a multi-executor cluster at 100 TB: everything
  is keyed/partitioned, nothing collects to the driver except final small
  results and report dicts.
"""

from covid_data_challenge_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
