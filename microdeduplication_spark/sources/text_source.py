"""Delimited-text sources (reference S2/S3 scans, SURVEY.md §2.1).

The reference reads N-quad text with a custom record delimiter so that one
"record" spans multiple physical lines
(/root/reference/deduplicaiton/.../ConvertionToEntities.java:36-45 sets
textinputformat.record.delimiter) and plain text with hand-set partition
counts (Deduplication.java:31). Spark-first equivalents:

- custom record delimiter -> spark.read.option("lineSep", ...).text(...)
- hand-set partitions -> repartition(n) only when the source is a single
  split; otherwise Catalyst/AQE decide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_records(
    spark: SparkSession,
    path: str,
    record_delimiter: str = "\n",
    min_partitions: int | None = None,
) -> DataFrame:
    """Text file(s) -> one row per `record_delimiter`-separated block.

    Returns a single `value: string` column (empty blocks dropped, like the
    reference's non-empty filters F6)."""
    df = spark.read.option("lineSep", record_delimiter).text(path)
    df = df.where(F.length(F.trim("value")) > 0)
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df


def parse_quads(lines: DataFrame, col: str = "value") -> DataFrame:
    """N-quad-ish lines -> (key, subject, predicate, obj).

    Reference quad format `<key> <subject> <predicate> <object> .`
    (processWarcFiles/.../Application.java:32-36); rows that do not split
    into exactly 4 fields are dropped (RDFStatistics.java:39-44, F7)."""
    parts = F.split(F.col(col), ">, <|> <")
    ok = lines.where(F.size(parts) == 4)
    clean = lambda c: F.regexp_replace(c, r"^<|>\s*\.?\s*$", "")  # noqa: E731
    return ok.select(
        clean(F.element_at(parts, 1)).alias("key"),
        clean(F.element_at(parts, 2)).alias("subject"),
        clean(F.element_at(parts, 3)).alias("predicate"),
        clean(F.element_at(parts, 4)).alias("obj"),
    )


def ogp_rewrite(col: Column) -> Column:
    """Broken-OGP attribute pre-pass (X2 quirk, WORKAROUND_BROKEN_OGP).

    The reference rewrites `property="article:` -> `property="og:article:`
    (and `profile:` likewise) on the raw HTML before extraction
    (MicroDataExtraction.java:65-68, plain-string replaceAll). Literal
    replace, JVM-side."""
    c = F.replace(col, F.lit('property="article:'), F.lit('property="og:article:'))
    return F.replace(c, F.lit('property="profile:'), F.lit('property="og:profile:'))


def _vcard_fix(key: Column, s: Column) -> Column:
    """The vcard-domain workaround for ONE ` .`-terminated statement.

    MicroDataExtraction.addURLToTriple (java:255-287): vcard triples carry a
    blank-node subject with no domain; when the subject (first space-separated
    field) is >= 25 chars and contains ':node', it is replaced by
    `<url>` where url = the '::'-joined key with field 5 (the datetime)
    blanked, concatenated WITHOUT separators (String.join("", parts)).

    Faithful quirks kept:
    - the reference's `keyParts[3] == "null"` uses Java REFERENCE equality
      on a freshly split string, so the "blank out a null query field"
      branch can never fire; we reproduce the no-op by not implementing it.
    - length/contains guards short-circuit exactly as in Java.
    - String.join("", keyParts) runs over ALL split parts with only index 4
      (the datetime field) blanked -- a key containing '::' inside a later
      field (> 5 parts) contributes those extra parts to the url verbatim.
    Deviation: a key with < 5 '::' fields would throw AIOOBE in the
    reference (aborting that extractor's whole document via the catch-all);
    here the statement is simply left unchanged."""
    kp = F.split(key, "::")
    url = F.concat_ws(
        "",
        F.transform(kp, lambda p, i: F.when(i == F.lit(4), F.lit("")).otherwise(p)),
    )
    subj = F.substring_index(s, " ", 1)
    fixable = (
        s.contains("vcard")
        & (F.length(subj) >= 25)
        & subj.contains(":node")
        & (F.size(kp) >= 5)
    )
    rest = F.substr(s, F.locate(" ", s) + F.lit(1))
    return F.when(
        fixable, F.concat(F.lit("<"), url, F.lit("> "), rest)
    ).otherwise(s)


def build_quads(key: Column, ntriples: Column) -> Column:
    """N-triples blob (one doc) -> array of N-quad lines (X2, quad building).

    Reference MicroDataExtraction.setStatements (java:218-253):
    split on `(\\s\\.)(\\r?\\n)` (the terminator is CONSUMED by the split),
    drop empties, re-append ` .`, apply the vcard-domain workaround, then
    prefix `<key> ` to form the quad. Pure Column: split + filter +
    transform higher-order functions, no Python.

    Catalyst note: the transform lambda runs over a materialized array
    column, so per-element work is linear (see memory: inline exprs inside
    HOF lambdas re-evaluate; `ntriples` here is a plain column reference,
    not a computed expression -- callers should pass a materialized column).
    """
    stmts = F.filter(
        F.split(ntriples, r"(\s\.)(\r?\n)"), lambda t: F.length(t) > 0
    )
    return F.transform(
        stmts,
        lambda t: F.concat(
            F.lit("<"), key, F.lit("> "),
            _vcard_fix(key, F.concat(t, F.lit(" ."))),
        ),
    )


def quads_from_triples(
    docs: DataFrame, key_col: str = "key", triples_col: str = "ntriples"
) -> DataFrame:
    """One row per built quad line: (key, quad). Dedup of identical triple
    lines within a doc (removeDuplicateTriples, java:206-215) is the X3
    within-doc pass -- compose with exact_dedup if needed."""
    # two steps: selecting alias("key") alongside an expression that reads
    # F.col("key") trips Spark 4's lateral-column-alias resolution
    with_quads = docs.withColumn(
        "_quads", build_quads(F.col(key_col), F.col(triples_col))
    )
    return with_quads.select(
        F.col(key_col).alias("key"), F.explode("_quads").alias("quad")
    )


def type_statistics(quads: DataFrame) -> DataFrame:
    """Records per type, descending (RDFStatistics.java:59-78 semantics:
    reduceByKey + swap-sort becomes one agg + orderBy)."""
    return (
        quads.where(F.col("predicate").contains("type"))
        .groupBy("obj")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("obj"))
    )
