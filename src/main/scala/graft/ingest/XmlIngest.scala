package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** MediaWiki XML dump → `Dataset[Article]`.
  *
  * The reference stitches `<page>…</page>` blocks out of line-oriented
  * splits with a custom record reader
  * (`ingest/.../reader/AggregatingRecordReader.java:170-313`); Spark's
  * text source does the same job natively with a custom record delimiter
  * (`lineSep = "</page>"`), so each input record is everything up to and
  * including one page close — S3 in SURVEY.md §2.1. Splitting is still
  * per-file-block and parallel at 100 TB (text source honors
  * `maxPartitionBytes`; bz2 dumps would need decompression first, as the
  * reference also assumes splittable inputs).
  *
  * Language comes from the file name (`([a-z_]+).*\.xml` →
  * `WikipediaMapper.java:96-102`), via `input_file_name()`.
  */
object XmlIngest {

  def readArticles(spark: SparkSession, path: String): Dataset[Article] = {
    import spark.implicits._
    spark.read
      .option("lineSep", "</page>")
      .text(path)
      .select(col("value"), input_file_name().as("file"))
      .filter(col("value").contains("<page>"))
      .as[(String, String)]
      .flatMap { case (chunk, file) =>
        val language = "([a-z_]+)[^/]*\\.xml".r
          .findFirstMatchIn(file.substring(file.lastIndexOf('/') + 1))
          .map(_.group(1)).getOrElse("unknown")
        val start = chunk.indexOf("<page>")
        ArticleExtractor.extract(chunk.substring(start) + "</page>", language)
      }
  }
}
