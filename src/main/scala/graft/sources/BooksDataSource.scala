package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.extract.BookHtml
import graft.model.Model.Book

/** DataSource V2 "books" source — the idiomatic Spark packaging of the
  * reference's HTTP scrape source (SURVEY.md §2 O1):
  *
  * {{{
  *   spark.read.format("graft.sources.BooksDataSource")
  *     .option("path", "/fixtures/details").load()
  * }}}
  *
  * Each detail-page HTML file under `path` parses to one typed row of the
  * 13-field book schema. Files are sharded into InputPartitions
  * (`filesPerPartition`, default 64), so a million-page crawl dump reads as
  * a normal parallel scan — executors parse independently, no driver
  * bottleneck beyond the listing. In a networked deployment the partition
  * reader's `fetch` would be an HTTP client; here it reads fixture files
  * (zero-egress environment).
  */
class BooksDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BooksDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new BooksTable(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object BooksDataSource {
  /** Typed book schema: the reference's 13 columns with parse-time types
    * (prices stay raw strings — cleaning is the transform layer's job). */
  val schema: StructType = StructType(Seq(
    StructField("Title", StringType),
    StructField("Description", StringType),
    StructField("Category", StringType),
    StructField("Image_link", StringType),
    StructField("Is_in_Stock", BooleanType),
    StructField("No_of_books_in_Stock", IntegerType),
    StructField("Rating", IntegerType),
    StructField("UPC", StringType),
    StructField("Product Type", StringType),
    StructField("Price (excl. tax)", StringType),
    StructField("Price (incl. tax)", StringType),
    StructField("Tax", StringType),
    StructField("Number of reviews", StringType)))
}

class BooksTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"books(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = BooksDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BooksScanBuilder(
      options.getOrDefault("path", properties.getOrElse("path", "")),
      options.getOrDefault("filesPerPartition",
        properties.getOrElse("filesPerPartition", "64")).toInt)
}

class BooksScanBuilder(path: String, filesPerPartition: Int) extends ScanBuilder {
  override def build(): Scan = new BooksScan(path, filesPerPartition)
}

case class BooksFilePartition(files: Seq[String]) extends InputPartition

class BooksScan(path: String, filesPerPartition: Int) extends Scan with Batch {
  override def readSchema(): StructType = BooksDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    val files: Seq[String] =
      if (Files.isDirectory(dir))
        Files.list(dir).iterator().asScala
          .filter(p => p.toString.endsWith(".html"))
          .map(_.toString).toSeq.sorted
      else Seq.empty
    files.grouped(math.max(1, filesPerPartition))
      .map(g => BooksFilePartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BooksReaderFactory
}

class BooksReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BooksPartitionReader(partition.asInstanceOf[BooksFilePartition].files)
}

class BooksPartitionReader(files: Seq[String]) extends PartitionReader[InternalRow] {
  private val it = files.iterator
  private var current: InternalRow = _

  private def toRow(b: Book): InternalRow = InternalRow(
    UTF8String.fromString(b.Title),
    UTF8String.fromString(b.Description),
    UTF8String.fromString(b.Category),
    UTF8String.fromString(b.Image_link),
    b.Is_in_Stock,
    b.No_of_books_in_Stock,
    b.Rating,
    UTF8String.fromString(b.UPC),
    UTF8String.fromString(b.`Product Type`),
    UTF8String.fromString(b.`Price (excl. tax)`),
    UTF8String.fromString(b.`Price (incl. tax)`),
    UTF8String.fromString(b.Tax),
    UTF8String.fromString(b.`Number of reviews`))

  override def next(): Boolean =
    if (it.hasNext) {
      val html = new String(Files.readAllBytes(Paths.get(it.next())), StandardCharsets.UTF_8)
      current = toRow(BookHtml.parseBook(html))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
