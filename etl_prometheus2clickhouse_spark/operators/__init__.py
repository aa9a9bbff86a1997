"""DataFrame→DataFrame operators.

- ``transform`` — the Prometheus-response parse pipeline (reference
  etl_job.py:545-738 re-expressed as from_json + double explode +
  higher-order array functions).
- ``dedup`` — exact and near-duplicate detection (engine extension for
  training-data pipelines: hash, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine).
- ``similarity`` — embedding top-k search (brute-force cosine and
  LSH-bucketed approximate variant).
- ``text`` — language-ID, quality scoring, token counting, document
  fingerprinting over the ``documents`` table.
- ``multimodal`` — opaque-binary column plumbing with stubbed decoders.
"""
