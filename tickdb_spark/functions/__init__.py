"""Column-level function library (text analysis, vector math) built on
pyspark.sql.functions — JVM-side, codegen-friendly, no Python UDFs."""
