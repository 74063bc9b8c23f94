package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A custom DataSource V2 `TableProvider` that models the reference's
  * external spreadsheet pull (Google-Sheets-style worksheets) as a local,
  * testable connector — the §2.1 "external ingest" capability row. Each
  * "worksheet" is a header-first tab-separated text file; a directory is a
  * workbook whose tabs are read in parallel (ONE InputPartition per tab —
  * at scale each tab streams independently on whatever executor gets it,
  * exactly how a real connector shards a remote source by tab/page token).
  *
  * Spreadsheets are schema-on-read with string cells, so the inferred
  * schema is header-named all-string columns (the reference's pandas pull
  * types cells downstream, and so do we: `CAST` in the query layer); a
  * user-supplied schema of strings renames/reorders columns. The
  * ScanBuilder implements `SupportsPushDownRequiredColumns`, so a
  * projection reaches the reader and each row materializes ONLY the
  * referenced cells (verified by a plan gate + parity test in MlSpec).
  *
  * Usage: `spark.read.format("graft.sources.SheetSourceProvider")
  * .load(dirOrFile)`. Zero-egress environment: the wire protocol is out of
  * scope by design (SURVEY §2.1); this demonstrates the Spark-side
  * machinery a real connector plugs into — schema inference, pruning,
  * partitioned parallel read.
  */
class SheetSourceProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SheetSource.headerSchema(SheetSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SheetTable(schema,
      SheetSource.pathOf(new CaseInsensitiveStringMap(properties)))
}

private[sources] object SheetSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "sheet source requires a path")
    p
  }

  /** Worksheet files of a workbook dir (or the single file), sorted for a
    * deterministic partition order. */
  def tabFiles(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    val files = if (f.isDirectory) f.listFiles().toSeq.filter(_.isFile) else Seq(f)
    files.sortBy(_.getName)
  }

  /** Schema = header row of the first tab: all-string columns, the
    * spreadsheet schema-on-read model. */
  def headerSchema(path: String): StructType = {
    val first = tabFiles(path).headOption
      .getOrElse(throw new IllegalArgumentException(s"no sheet tabs under $path"))
    val src = scala.io.Source.fromFile(first, "UTF-8")
    try {
      val header = src.getLines().nextOption()
        .getOrElse(throw new IllegalArgumentException(s"empty sheet tab $first"))
      StructType(header.split("\t", -1).map(c => StructField(c, StringType, nullable = true)))
    } finally src.close()
  }
}

private class SheetTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"sheet($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SheetScanBuilder(schema, path)
}

/** Pruning-aware scan builder: Catalyst hands the required top-level
  * columns here; the reader then parses only those cell indices. */
private class SheetScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's own column order; an empty projection (e.g.
    // count(*)) legitimately prunes to zero columns
    required = StructType(full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new SheetScan(full, required, path)
}

private class SheetScan(full: StructType, required: StructType, path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-sheet $path readSchema=${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SheetSource.tabFiles(path).map(f => SheetTabPartition(f.getAbsolutePath): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SheetReaderFactory(full.fieldNames, required.fieldNames)
}

private case class SheetTabPartition(file: String) extends InputPartition

/** Serializable factory shipped to executors: carries only the column
  * names, resolves cell indices once per partition. */
private class SheetReaderFactory(fullCols: Array[String], requiredCols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SheetTabPartition].file
    val idx = requiredCols.map(c => fullCols.indexOf(c))
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(file, "UTF-8")
      private val lines = src.getLines().drop(1) // header
      private var row: InternalRow = _
      override def next(): Boolean =
        if (lines.hasNext) {
          val cells = lines.next().split("\t", -1)
          row = InternalRow.fromSeq(idx.toSeq.map { i =>
            if (i >= 0 && i < cells.length) UTF8String.fromString(cells(i)) else null
          })
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = src.close()
    }
  }
}
