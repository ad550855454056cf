"""Training-data pipeline operators over web-text corpora.

The geocode engine's input at production scale is a Common-Crawl-style table
of 10^12 pages; before geocoding, such corpora pass through standard
training-data hygiene stages. This subpackage implements them Spark-first:

  textstats.py   — token counting, quality scoring, language ID, fingerprints
  dedup.py       — exact dedup, n-gram Jaccard, MinHash+LSH, SimHash
  similarity.py  — embedding cosine top-k (brute force + sign-LSH bucketed)
  multimodal.py  — opaque-binary columns: header decode, resize plan,
                   frame sampling (decode kernels stubbed — no image/audio
                   libs in this environment; the Spark plumbing is real)

Every operator ships a DuckDB oracle builder generated from the same
constants/formulas as the Spark plan, so the driver's side-by-side
correctness gate hash-compares them bitwise.
"""
