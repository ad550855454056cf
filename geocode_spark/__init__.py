"""geocode_spark — a brand-new PySpark-native geocoding + spatial-join engine.

Re-expresses the observable query semantics of the (deprecated) UGRC/AGRC
geocoding toolbox (reference: /root/reference, ~700 LoC per-row HTTP client,
`src/agrcgeocoding/geocode.py`) as pure, declarative Spark data logic:

- byte-identical street/zone cleansing        (cleansing.py  ~ geocode.py:40-62)
- Utah address-grammar parsing                 (grammar.py)
- vectorized address extraction from web text  (extraction.py)
- broadcast locator joins + scoring + top-1    (operators/geocode.py ~ geocode.py:198-250)
- spatial layer: Z-order cells, kNN, PIP, tiles (operators/spatial.py)
- flow control: health probe, batch ledger      (plans/ ~ geocode.py:37,190-191,168-174)
- 11-column result contract                     (geocode.py:33-36)

Everything is DataFrame-first: Catalyst column expressions on the hot path,
Arrow-vectorized pandas UDFs where regex/Python semantics are mandated, no
row-at-a-time Python, no RDDs.
"""

__version__ = "0.1.0"

ENGINE_NAME = "geocode-spark"

# Output contract: HEADER at reference geocode.py:33-36.
RESULT_COLUMNS = (
    "primary_key",
    "input_street",
    "input_zone",
    "x",
    "y",
    "score",
    "locator",
    "matchAddress",
    "standardizedAddress",
    "addressGrid",
    "message",
)

# Defaults mirrored from reference geocode.py:25-28.
DEFAULT_SPATIAL_REFERENCE = 26912
DEFAULT_LOCATOR_NAME = "all"
DEFAULT_POBOX = False
DEFAULT_ACCEPT_SCORE = 70
HEALTH_PROBE_COUNT = 25  # geocode.py:37
