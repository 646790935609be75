"""Domain function library: text analysis + genomic interval predicates.

Everything here returns Column expressions built from
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no Python UDFs.
"""
