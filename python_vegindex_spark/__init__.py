"""python_vegindex_spark — a PySpark-native time-series rollup engine.

Brand-new engine with the query/data-processing capabilities of
``tmilliman/python-vegindex`` (reference at /root/reference), re-expressed
Spark-first over tables of conversation transcripts:

* tiered summarization: raw turns -> per-turn features (tier-1) ->
  hourly/daily/weekly continuous aggregates (tier-2), mirroring
  vegindex's roistats -> 1-day -> 3-day pipeline
  (reference: generate_summary_timeseries.py:229-461)
* gap-filled calendar-anchored buckets (reference: vegindex.py:22-64)
* exact Hyndman-Fan type-7 percentile rollups, the "gcc90" estimator
  (reference: quantile.py:14-76)
* as-of joins (reference: generate_ndvi_timeseries.py:138-149)
* incremental, checkpoint-resumable updates (reference:
  update_roi_timeseries.py:131-242, update_summary_timeseries.py:212-524)
* Gorilla XOR float + delta-of-delta timestamp chunk compression,
  retention compaction, lineage/metrics (north_rule additions)

All computation is DataFrame / Spark SQL / vectorized Arrow UDFs — no
per-row Python in any hot path.
"""

__version__ = "0.1.0"
