package graft.vcr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** V12: tape integrity check — the fsck that completes the tape's ops
  * lifecycle (record → compact → expire → VERIFY). A tape file's
  * contract is carried half in its NAME (`{firstSeq}-{lastSeq}.txt`,
  * first ≤ last) and half in its CONTENT (one standard-Base64 line per
  * record, no more lines than the declared seq-range width). Crashes,
  * partial copies, and hand edits break exactly these invariants, and
  * a replay over a corrupt file either throws mid-stream or silently
  * emits garbage payloads — fsck finds it first.
  *
  * Execution shape: one distributed pass over the (pruned) text files
  * — every line decodes through `try_to_binary(..., 'base64')` (null =
  * malformed, a codegen check, no parsing on the driver) and
  * aggregates per file; the name contract is column regex over the
  * file path. No payload byte ever reaches the driver; verdicts are
  * per-file rows a maintenance job can alert on.
  *
  * Verdict precedence: `bad_name` (range unparseable or inverted — the
  * file can't even be addressed) → `bad_lines` (undecodable content)
  * → `overfull` (more records than the declared range width — the
  * name lies about the content) → `ok`. Empty files surface as
  * overfull? No: an empty file produces no rows for this pass, which
  * is exactly what it contributes to a replay; directory-level
  * accounting (files seen vs files with rows) is the compactor's
  * listing's job.
  */
object TapeFsck {

  def fsck(spark: SparkSession, root: String, stream: String): DataFrame = {
    val dir = s"$root/$stream"
    val lines = spark.read.option("basePath", dir).text(dir)
      .select(col("value"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"),
        col(Tape.DtCol).cast("string").as(Tape.DtCol))
    lines
      .withColumn("declared_first",
        regexp_extract(col("file"), "^(\\d+)-(\\d+)(?:\\.txt)?$", 1))
      .withColumn("declared_last",
        regexp_extract(col("file"), "^(\\d+)-(\\d+)(?:\\.txt)?$", 2))
      .withColumn("bad_line",
        when(length(col("value")) > 0 &&
          expr("try_to_binary(value, 'base64')").isNull, 1L)
          .otherwise(0L))
      .groupBy(col(Tape.DtCol), col("file"),
        col("declared_first"), col("declared_last"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("bad_line")).as("n_bad_lines"))
      .withColumn("name_ok",
        col("declared_first") =!= "" &&
          col("declared_first").cast("long") <=
            col("declared_last").cast("long"))
      .withColumn("range_width",
        when(col("name_ok"),
          col("declared_last").cast("long") -
            col("declared_first").cast("long") + 1L))
      .withColumn("status",
        when(!col("name_ok"), "bad_name")
          .when(col("n_bad_lines") > 0, "bad_lines")
          .when(col("n_lines") > col("range_width"), "overfull")
          .otherwise("ok"))
      .select(col(Tape.DtCol), col("file"), col("status"),
        col("n_lines"), col("n_bad_lines"), col("range_width"))
      .orderBy(col(Tape.DtCol), col("file"))
  }
}
