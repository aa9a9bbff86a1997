"""DataFrame→DataFrame operators.

- ``transform`` — the Prometheus-response parse pipeline (reference
  etl_job.py:545-738 re-expressed as from_json + double explode +
  higher-order array functions).
- ``dedup`` — exact and near-duplicate detection (engine extension for
  training-data pipelines: hash, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine) plus duplicate-cluster resolution (connected
  components) and the ``cached_scope`` cache-lifetime contract.
- ``similarity`` — embedding top-k search (brute-force cosine, Arrow
  GEMM, LSH-bucketed, IVF, and PQ+ADC variants) and self near-dup with
  the self-sizing ``plan_near_dup`` strategy planner.
- ``joins`` — temporal joins Spark lacks as built-ins: as-of
  (backward/forward) and interval range join.
- ``timeseries`` — counter rate and sessionization, plain and
  skew-proof bucketed.
- ``text`` — language-ID, quality scoring, token counting, document
  fingerprinting over the ``documents`` table.
- ``multimodal`` — opaque-binary column plumbing; real stdlib decode
  for common-subset PNG, PCM WAV, and (via ``jpegcodec``) baseline
  JPEG; Pillow fallback for exotic flavors.
- ``sketch`` — mergeable sketch family (KMV, histogram quantiles,
  Bloom, CMS) with carried-geometry validation.
- ``jpegcodec`` — table-driven baseline JPEG (T.81) decoder + DC-only
  fixture encoder.
"""
