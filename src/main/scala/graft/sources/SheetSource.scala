package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull, IsNull}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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
  * .load(dirOrFile)`, and symmetrically
  * `df.write.format(...).mode("overwrite").save(dir)` — the write side
  * ([[SheetWriteBuilder]]) models the reference's "upload spec documents"
  * step with a staged-rename commit protocol. Zero-egress environment:
  * the wire protocol is out of scope by design (SURVEY §2.1); this
  * demonstrates the Spark-side machinery a real connector plugs into —
  * schema inference, pruning, partitioned parallel read, commit-safe
  * partitioned write.
  */
class SheetSourceProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SheetSource.headerSchema(SheetSource.pathOf(options))

  // writes hand the query's own schema in (a brand-new workbook dir has
  // no header to infer from)
  override def supportsExternalMetadata(): Boolean = true

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
    * deterministic partition order. In-flight `_staged_` files are NOT
    * tabs: a reader (batch or streaming) must never observe a write
    * before its commit rename. */
  def tabFiles(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    val files = if (f.isDirectory) f.listFiles().toSeq.filter(_.isFile) else Seq(f)
    files.filterNot(_.getName.startsWith("_staged_")).sortBy(_.getName)
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
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"sheet($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SheetScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SheetWriteBuilder(info.schema(), path)
}

/** Write side of the workbook connector — the analogy of the reference's
  * "upload spec documents" step (SURVEY §3.1): each task writes its
  * partition as one worksheet tab (header-first TSV, string cells — the
  * read side's schema-on-read model, so a written workbook round-trips
  * through the reader), staged under a task-unique name and renamed into
  * place only at driver commit. `mode("overwrite")` maps to
  * SupportsTruncate: existing tabs are removed at commit, after every
  * task has staged successfully — a failed job never leaves a
  * half-replaced workbook. A real Sheets/Drive connector swaps the
  * rename for an idempotent upload keyed by (queryId, partitionId).
  */
private class SheetWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new SheetBatchWrite(schema, path, replace)
  }
}

private case class SheetTabCommit(staged: String) extends WriterCommitMessage

private class SheetBatchWrite(schema: StructType, path: String, replace: Boolean)
    extends BatchWrite {
  require(schema.fields.forall(_.dataType == StringType),
    s"sheet cells are strings (schema-on-read) — cast before writing: $schema")
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SheetWriterFactory(path, schema.fieldNames)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    if (replace)
      Option(dir.listFiles()).foreach(_.filter(f =>
        f.isFile && !f.getName.startsWith("_staged_")).foreach(_.delete()))
    // append mode numbers AFTER the existing committed tabs — re-starting
    // at 0 would overwrite earlier batches' tabs in place (silent data
    // loss) AND violate the append-only name order the streaming offset
    // relies on. Base = max existing tab_%05d index + 1 (gap-proof: a
    // count would collide after a deleted tab), and the first new name
    // must sort strictly after EVERY existing tab — a workbook holding
    // hand-named tabs that sort later (e.g. "z.tsv") cannot accept
    // order-preserving appends, so fail BEFORE any rename rather than
    // strand a running stream on a shifted listing.
    val existing = if (replace) Seq.empty else SheetSource.tabFiles(path)
    val TabIdx = raw"tab_(\d{5})\.tsv".r
    val base = existing.map(_.getName).collect {
      case TabIdx(n) => n.toInt + 1 }.maxOption.getOrElse(0)
    if (existing.nonEmpty) {
      val firstNew = f"tab_$base%05d.tsv"
      val lastExisting = existing.last.getName
      require(firstNew > lastExisting,
        s"append would land '$firstNew' out of sorted-name order after " +
          s"'$lastExisting' — rename non-standard tabs or use overwrite")
    }
    // hard capacity: 5-digit names hold 100,000 tabs. Past that the next
    // name would be 6 digits and sort BEFORE tab_99999.tsv, silently
    // breaking the append-order contract the streaming offset relies on —
    // fail with the real reason instead of a confusing order-guard error.
    // (Widening the padding can't fix this in place: 9-digit names sort
    // before existing 5-digit ones, so migration would need a rewrite.)
    require(base + messages.length <= 100000,
      s"workbook tab capacity exceeded: append needs tabs $base..${base + messages.length - 1} " +
        "but the 5-digit naming scheme holds at most 100,000 tabs — " +
        "start a new workbook directory")
    // all-or-nothing against concurrent writers: compute the full target
    // set and check every collision BEFORE the first rename — a require
    // thrown mid-loop would leave earlier tabs already committed, exposing
    // a partial append to batch and streaming readers
    val staged = messages.map(m =>
      new java.io.File(m.asInstanceOf[SheetTabCommit].staged))
    val targets = staged.indices.map(i =>
      new java.io.File(dir, f"tab_${base + i}%05d.tsv"))
    targets.foreach(t => require(!t.exists(),
      s"commit collision: $t already exists (concurrent writers?)"))
    staged.zip(targets).foreach { case (src, target) =>
      require(src.renameTo(target), s"commit rename failed: $src -> $target")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case SheetTabCommit(staged) => new java.io.File(staged).delete()
      case _ => ()
    }
}

private class SheetWriterFactory(path: String, cols: Array[String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val staged = new java.io.File(dir, s"_staged_${partitionId}_$taskId.tsv")
    new DataWriter[InternalRow] {
      private val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(
          new java.io.FileOutputStream(staged), "UTF-8"))
      out.println(cols.mkString("\t"))
      override def write(row: InternalRow): Unit =
        out.println((0 until cols.length).map { i =>
          if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
        }.mkString("\t"))
      override def commit(): WriterCommitMessage = {
        out.close(); SheetTabCommit(staged.getAbsolutePath)
      }
      override def abort(): Unit = { out.close(); staged.delete() }
      override def close(): Unit = out.close()
    }
  }
}

/** The filters the tab reader evaluates itself — a serializable mirror
  * of the accepted `sources.Filter`s, resolved to cell semantics: a cell
  * is NULL only when the row is shorter than the header (the reader's
  * missing-cell rule), so EqualTo is null-rejecting exactly like Spark's.
  */
private[sources] sealed trait SheetFilter extends Serializable {
  def col: String
  def eval(cell: String): Boolean
}
private[sources] case class SheetEq(col: String, value: String) extends SheetFilter {
  def eval(cell: String): Boolean = cell != null && cell == value
}
private[sources] case class SheetNotNull(col: String) extends SheetFilter {
  def eval(cell: String): Boolean = cell != null
}
private[sources] case class SheetIsNull(col: String) extends SheetFilter {
  def eval(cell: String): Boolean = cell == null
}

/** Pruning- and predicate-aware scan builder: Catalyst hands the required
  * top-level columns AND the query's filters here. Column pruning makes
  * each row materialize only referenced cells; filter pushdown
  * (`SupportsPushDownFilters` — the next rung of the DSv2 ladder) lets
  * equality / null-ness predicates on string cells die AT the tab reader,
  * so a selective query ships only matching rows out of the source —
  * the one place in the engine where a predicate can reach a non-parquet
  * scan. Accepted filters are FULLY evaluated by the reader (they are
  * not re-evaluated post-scan), so their semantics must match Spark's
  * exactly — see [[SheetFilter]]. Everything else is returned to Spark
  * untouched.
  */
private class SheetScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's own column order; an empty projection (e.g.
    // count(*)) legitimately prunes to zero columns
    required = StructType(full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(c, v: String) => full.fieldNames.contains(c) && v != null
      case IsNotNull(c)          => full.fieldNames.contains(c)
      case IsNull(c)             => full.fieldNames.contains(c)
      case _                     => false
    }
    pushed = accepted
    rejected // Spark re-evaluates ONLY these after the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = {
    val sheetFilters: Array[SheetFilter] = pushed.map {
      case EqualTo(c, v: String) => SheetEq(c, v): SheetFilter
      case IsNotNull(c)          => SheetNotNull(c)
      case IsNull(c)             => SheetIsNull(c)
      case f => throw new IllegalStateException(s"unpushable filter $f")
    }
    new SheetScan(full, required, path, sheetFilters)
  }
}

private class SheetScan(full: StructType, required: StructType, path: String,
    filters: Array[SheetFilter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft-sheet $path readSchema=${required.fieldNames.mkString(",")}" +
      s" pushedFilters=[${filters.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SheetSource.tabFiles(path).map(f => SheetTabPartition(f.getAbsolutePath): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SheetReaderFactory(full.fieldNames, required.fieldNames, filters)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SheetMicroBatchStream(path, full.fieldNames, required.fieldNames, filters)
}

/** Offset = how many tabs (in name order) have been consumed, PLUS the
  * name of the last consumed tab — the anchor that detects a listing
  * whose prefix changed (a file landing with an earlier sort name would
  * otherwise silently shift the slice: duplicates re-emitted, the real
  * new tab skipped). */
private case class SheetOffset(tabCount: Int, lastTab: String) extends Offset {
  override def json(): String =
    if (tabCount == 0) "0" else s"$tabCount|$lastTab"
}

private object SheetOffset {
  def parse(json: String): SheetOffset = json.trim.split("\\|", 2) match {
    case Array(n) => SheetOffset(n.toInt, "")
    case Array(n, name) => SheetOffset(n.toInt, name)
  }
}

/** Streaming read of a workbook dir — the reference's "poll the
  * spreadsheet for new data" made incremental: each trigger reads the
  * tabs that appeared SINCE the last committed offset, one InputPartition
  * per new tab, through the same pruning/pushdown-aware reader factory as
  * the batch scan (column pruning and pushed filters apply per
  * micro-batch). Exactly-once rests on the workbook write contract:
  * committed tabs are `tab_%05d` in arrival order (append mode numbers
  * after the existing tabs) and never rewritten, so the name-sorted
  * listing only ever APPENDS — the reference's append-only run-log
  * reality. Both failure modes of that contract are detected loudly in
  * `planInputPartitions`, never silently mis-sliced: a SHRUNK listing
  * (tab deleted) and a SHIFTED prefix (a file landed with an earlier
  * sort name than the committed anchor).
  */
private class SheetMicroBatchStream(path: String, fullCols: Array[String],
    requiredCols: Array[String], filters: Array[SheetFilter])
    extends MicroBatchStream {
  private def offsetAt(tabs: Seq[java.io.File], n: Int): SheetOffset =
    SheetOffset(n, if (n == 0) "" else tabs(n - 1).getName)
  override def initialOffset(): Offset = SheetOffset(0, "")
  override def latestOffset(): Offset = {
    val tabs = SheetSource.tabFiles(path)
    offsetAt(tabs, tabs.length)
  }
  override def deserializeOffset(json: String): Offset = SheetOffset.parse(json)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (so, eo) = (start.asInstanceOf[SheetOffset], end.asInstanceOf[SheetOffset])
    val tabs = SheetSource.tabFiles(path)
    def anchored(o: SheetOffset): Boolean =
      o.tabCount == 0 || o.lastTab.isEmpty || // legacy anchor-less offset
        (tabs.length >= o.tabCount && tabs(o.tabCount - 1).getName == o.lastTab)
    require(tabs.length >= eo.tabCount,
      s"workbook $path shrank below committed offset ${eo.tabCount} " +
        s"(${tabs.length} tabs) — tabs must be append-only")
    require(anchored(so) && anchored(eo),
      s"workbook $path listing prefix changed under committed offsets " +
        s"(${so.json()} .. ${eo.json()}) — a tab landed out of name order; " +
        "tabs must be append-only in sorted-name order")
    tabs.slice(so.tabCount, eo.tabCount)
      .map(f => SheetTabPartition(f.getAbsolutePath): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SheetReaderFactory(fullCols, requiredCols, filters)
  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}

private case class SheetTabPartition(file: String) extends InputPartition

/** Serializable factory shipped to executors: carries only the column
  * names + pushed filters, resolves cell indices once per partition.
  * Filters are evaluated against the FULL cell row (a pushed filter's
  * column may be pruned out of the read schema), rows failing any filter
  * are skipped before an InternalRow is ever built. */
private class SheetReaderFactory(fullCols: Array[String],
    requiredCols: Array[String], filters: Array[SheetFilter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[SheetTabPartition].file
    val idx = requiredCols.map(c => fullCols.indexOf(c))
    val fidx = filters.map(f => (fullCols.indexOf(f.col), f))
    new PartitionReader[InternalRow] {
      private val src = scala.io.Source.fromFile(file, "UTF-8")
      private val lines = src.getLines().drop(1) // header
      private var row: InternalRow = _
      private def cellAt(cells: Array[String], i: Int): String =
        if (i >= 0 && i < cells.length) cells(i) else null
      override def next(): Boolean = {
        while (lines.hasNext) {
          val cells = lines.next().split("\t", -1)
          if (fidx.forall { case (i, f) => f.eval(cellAt(cells, i)) }) {
            row = InternalRow.fromSeq(idx.toSeq.map { i =>
              val c = cellAt(cells, i)
              if (c == null) null else UTF8String.fromString(c)
            })
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = src.close()
    }
  }
}
