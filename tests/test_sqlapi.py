"""SQL-function surface (functions/sqlapi.py): the ds_* SQL macros must
be expression-for-expression identical to the Column API on edge inputs,
and stay JVM-side (no PythonUDF in the plan)."""

from pyspark.sql import functions as F

from disq_spark.functions import text as TX
from disq_spark.functions.sqlapi import SQL_FUNCTION_NAMES, register_sql_functions
from disq_spark.operators.dedup import content_hash, gram_hash
from disq_spark.operators.sampling import uniform_sql

EDGE = ["Hello  world", "", "   ", "one", "a b  c\td\ne", "it's 2024-08, v2.0!"]


def test_sql_functions_match_column_api(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE)], "i long, s string")
    df.createOrReplaceTempView("sqlapi_edge")
    got = spark.sql(
        """
        SELECT i, ds_normalize(s) AS norm, ds_tokens(s) AS toks,
               ds_token_count(s) AS n, ds_bpe_token_count(s) AS nb,
               ds_fingerprint(s) AS fp, ds_content_hash(s) AS ch,
               ds_gram_hash(s) AS gh, ds_uniform(s, 'seed') AS u
        FROM sqlapi_edge ORDER BY i
        """
    ).collect()
    want = (
        df.select(
            "i",
            TX.normalize("s").alias("norm"),
            TX.tokens("s").alias("toks"),
            TX.token_count("s").alias("n"),
            TX.bpe_token_count("s").alias("nb"),
            TX.fingerprint("s").alias("fp"),
            content_hash(F.col("s")).alias("ch"),
            gram_hash(F.col("s")).alias("gh"),
            # the shared fragment divides by a decimal literal in Spark's
            # parser (double in DuckDB's) — value-identical, cast for type
            F.expr(uniform_sql("s", "seed")).cast("double").alias("u"),
        )
        .orderBy("i")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sql_functions_stay_jvm_side(spark):
    """SQL macros must expand to expressions, never Python UDFs."""
    register_sql_functions(spark)
    spark.range(10).selectExpr("cast(id as string) s").createOrReplaceTempView(
        "sqlapi_plan"
    )
    q = spark.sql("SELECT ds_token_count(s) AS n, ds_uniform(s, 'x') AS u FROM sqlapi_plan")
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "simple")
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan
    assert len(SQL_FUNCTION_NAMES) == 8


def test_sql_functions_idempotent_reregistration(spark):
    register_sql_functions(spark)
    register_sql_functions(spark)  # CREATE OR REPLACE: no error
    assert spark.sql("SELECT ds_token_count('a b') AS n").collect()[0].n == 2


def test_query_modules_have_no_duplicate_constant_bindings():
    """Regression guard for the r9 doc_chunking_stats incident: a gate
    module's UPPERCASE constants are read at CALL time by gate
    functions but baked at IMPORT time into oracle SQL strings — a
    second top-level binding of the same name (e.g. a new gate block
    appended with its own CHUNK_OVERLAP) silently changes every earlier
    gate that reads it at runtime while their oracles keep the old
    value. Each constant must be bound exactly once per module."""
    import ast
    import os

    qdir = os.path.join(os.path.dirname(__file__), "..", "disq_spark", "queries")
    for fn in sorted(os.listdir(qdir)):
        if not fn.endswith(".py"):
            continue
        tree = ast.parse(open(os.path.join(qdir, fn)).read())
        seen: set = set()
        dups = []

        def visit(stmts):
            for node in stmts:
                targets = []
                if isinstance(node, ast.Assign):
                    targets = node.targets
                elif isinstance(node, ast.AnnAssign) and node.value is not None:
                    targets = [node.target]
                for tgt in targets:
                    if isinstance(tgt, ast.Name) and tgt.id.isupper():
                        if tgt.id in seen:
                            dups.append(tgt.id)
                        seen.add(tgt.id)
                # module-level bindings hidden inside if/try/with blocks
                # (but NOT function/class bodies) still rebind globals
                for attr in ("body", "orelse", "finalbody"):
                    if not isinstance(
                        node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                    ) and hasattr(node, attr):
                        visit(getattr(node, attr))
                if hasattr(node, "handlers"):
                    for h in node.handlers:
                        visit(h.body)

        visit(tree.body)
        assert dups == [], f"{fn}: constants bound more than once: {dups}"
