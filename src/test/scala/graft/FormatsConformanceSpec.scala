package graft

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Format conformance beyond the golden corpus
  * (reference-scan-formats.test):
  *
  *  - corrupt-parquet handling (QueryTest/parquet.test's
  *    bad_metadata_len / bad_magic_number / bad_dict_page_offset /
  *    bad_compressed_size fixtures): the reference raises a scan error
  *    for each; here each either raises Spark's own error or yields no
  *    rows — corrupt files NEVER produce wrong data silently.
  *  - Avro fixture reads (avro-schema-resolution.test's decimal file,
  *    chars-formats.avro) through the bundled Avro source.
  *  - text/avro writer compression codecs (text-writer.test,
  *    avro-writer.test): the reference REJECTS compressed text and
  *    gates Avro writes behind ALLOW_UNSUPPORTED_FORMATS; this engine
  *    writes both natively — the round trip must preserve values under
  *    every codec the reference names (none/snappy/gzip).
  */
class FormatsConformanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val data = "/root/reference/testdata/data"
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  private def errorsOrEmpty(path: String): Unit = {
    val rows =
      try spark.read.parquet(path).collect()
      catch { case _: Throwable => return } // raised — reference behavior
    assert(rows.isEmpty, s"corrupt file $path returned data")
  }

  test("parquet.test: corrupt files error or return nothing, never bad rows") {
    errorsOrEmpty(s"$data/bad_metadata_len.parquet")
    errorsOrEmpty(s"$data/bad_magic_number.parquet")
    errorsOrEmpty(s"$data/bad_dict_page_offset.parquet")
    errorsOrEmpty(s"$data/bad_compressed_size.parquet")
    errorsOrEmpty(s"$data/repeated_values.parquet")
  }

  test("avro-schema-resolution.test: avro decimal fixture decodes") {
    val df = spark.read.format(AvroProvider).load(s"$data/avro_decimal_tbl.avro")
    // the reference's avro_decimal_tbl (decimal logical types resolved
    // from the writer schema)
    assert(df.count() > 0)
    assert(df.schema.fields.exists(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]))
  }

  test("chars-formats.test: the avro copy decodes to the same rows as parquet") {
    val avro = spark.read.format(AvroProvider)
      .load(s"$data/chars-formats.avro").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    val parq = spark.read.parquet(s"$data/chars-formats.parquet").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    assert(avro === parq)
    assert(avro.length === 3)
  }

  test("text-writer.test: __text_write round-trips under every codec") {
    import spark.implicits._
    val src = Seq((0, "a", 1.1), (1, "b", 2.2), (2, "c", 3.3), (3, "d", 4.4))
    val tmp = System.getProperty("java.io.tmpdir")
    // the reference writes each row under a different COMPRESSION_CODEC
    // (NONE/DEFAULT/SNAPPY/GZIP) into one text table; Spark writes each
    // codec to a directory and the scan reads them all back decoded
    for (codec <- Seq("none", "gzip", "bzip2", "deflate")) {
      val path = s"$tmp/graft_text_write_$codec"
      src.toDF("i", "s", "d").selectExpr("concat_ws(',', i, s, d) AS value")
        .write.mode(SaveMode.Overwrite).option("compression", codec).text(path)
      val got = spark.read.text(path).collect().map(_.getString(0)).sorted
      assert(got === src.map { case (i, s, d) => s"$i,$s,$d" }.sorted.toArray,
        codec)
    }
  }

  test("avro-writer.test: avro write round-trips under snappy and uncompressed") {
    import spark.implicits._
    val src = Seq((0, "a", 1.1), (1, "b", 2.2))
    val tmp = System.getProperty("java.io.tmpdir")
    for (codec <- Seq("uncompressed", "snappy")) {
      val path = s"$tmp/graft_avro_write_$codec"
      src.toDF("i", "s", "d").write.mode(SaveMode.Overwrite)
        .format(AvroProvider).option("compression", codec).save(path)
      val back = spark.read.format(AvroProvider).load(path)
        .as[(Int, String, Double)].collect().sorted
      assert(back === src.sorted.toArray, codec)
    }
  }

  /** parquet-continue-on-error.test's mixed-directory shape: a scan over
    * a location holding both a good and a truncated parquet file keeps
    * the good file's rows under ABORT_ON_ERROR=0 (ignoreCorruptFiles)
    * and fails the query under ABORT_ON_ERROR=1 — the golden port covers
    * the single-file bad-metadata fixture through the SQL front door.
    */
  test("parquet-continue-on-error: mixed good/corrupt directory") {
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_mixed_corrupt_spec")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    val good = java.nio.file.Paths.get("/root/testdata/sf0.001/region.parquet")
    java.nio.file.Files.copy(good,
      new java.io.File(dir, "good.parquet").toPath)
    // a truncated copy: valid magic, unreadable footer
    val bytes = java.nio.file.Files.readAllBytes(good)
    java.nio.file.Files.write(
      new java.io.File(dir, "bad.parquet").toPath,
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2))
    val schema = spark.read.parquet(good.toString).schema
    val goodRows = spark.read.parquet(good.toString).count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val kept = spark.read.schema(schema).parquet(dir.getPath).count()
      assert(kept == goodRows, s"continue-on-error kept $kept rows")
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
      val e = intercept[org.apache.spark.SparkException] {
        spark.read.schema(schema).parquet(dir.getPath).collect()
      }
      assert(e.getMessage.contains("FAILED_READ_FILE") ||
        Option(e.getCause).exists(_.toString.contains("Parquet")))
    } finally {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }
}
