"""spark-doccheck: a from-scratch PySpark-native schema + constraint validation
engine over tables of interleaved text+media documents.

Capabilities mirror mazoti/datachecker (see SURVEY.md for the structural map of
the reference at /root/reference) re-expressed Spark-first: every constraint
compiles to Spark SQL Column expressions or vectorized pandas/Arrow UDFs — no
per-row Python anywhere in the hot path.
"""

__version__ = "0.1.0"
