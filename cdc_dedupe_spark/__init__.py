"""cdc_dedupe_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``ecommerce-run/cdc-dedupe`` reference
(CDC stream dedupe, see /root/reference WatchStream.java), extended with a
full relational/analytic operator surface and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Architecture: thin, well-tested Python package over stock PySpark 4.x.
Everything is declared via the DataFrame/SQL API so Catalyst + Tungsten pick
the physical strategy; no RDDs, no custom Catalyst rules. Python UDFs appear
only where built-ins genuinely can't express the semantics (and then as
Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
