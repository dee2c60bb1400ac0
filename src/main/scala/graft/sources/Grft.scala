package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GRFT — a packed row-major binary embedding format, exposed through
  * the DataSource V2 API (the one Catalyst extension point the engine
  * had not yet exercised: custom source/sink with pruning and pushdown).
  * The reference's S2 source is exactly this shape — CIFAR python-pickle
  * batches, fixed-width row-major records of (id, label, pixels)
  * (/root/reference/kmeans_clustering/image_classification.py:150-170,
  * unpickled dict of row-major uint8 rows); GRFT is that record layout
  * with a 16-byte header, little-endian fixed-width rows, and no
  * Python-specific framing.
  *
  * Layout: magic "GRFT" | version | dim | reserved (4×int32 LE), then
  * rows of `vec_id int64 | label int32 | dim × float32`. Fixed row
  * width is the scale property: a reader can seat a SPLIT at any row
  * boundary by arithmetic alone — no row index, no sync markers — so
  * one 100 TB directory fans out into `size / maxPartitionBytes`
  * independent range reads, planned here exactly like parquet's file
  * splits ([[GrftScan.planInputPartitions]] honors
  * `spark.sql.files.maxPartitionBytes`).
  *
  * Read path: `SupportsPushDownRequiredColumns` prunes parsing and
  * allocation to the projected fields (row-major storage still reads
  * the bytes — columnar IO pruning is parquet's job; this is the honest
  * trade of the packed format, same as the reference's pickle batches),
  * and `SupportsPushDownFilters` accepts vec_id/label comparisons so
  * scans report `PushedFilters` and rows drop at the source instead of
  * in a post-scan Filter operator. Both are plan-asserted in SourceSpec.
  *
  * Write path: `SupportsTruncate` batch write (mode=overwrite ≡
  * truncate); each task streams one `part-*.grft` file — the header's
  * dim is taken from the task's first row, so writes never buffer more
  * than one row. Executors re-open the filesystem from the default
  * Hadoop configuration (production would broadcast a serialized conf;
  * the formats under test resolve from the classpath defaults).
  */
object Grft {
  val Magic = 0x47524654 // "GRFT"
  val Version = 1
  val HeaderBytes = 16

  val Schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("label", IntegerType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  def rowWidth(dim: Int): Int = 12 + 4 * dim

  /** Per-file scalar statistics manifest (the parquet row-group-stats /
    * Iceberg-manifest analogue for this format): one tiny driver-written
    * file mapping each committed data file to its (vec_id, label)
    * min/max, collected from task commit messages — no second read of
    * the data. ADVISORY by contract: a file with no manifest entry is
    * scanned fully, so a missing/stale manifest (crash between commit
    * steps, hand-copied files) degrades to no-skip, never to wrong
    * rows. The name does not end in ".grft" so data-file listings
    * never pick it up. */
  val ManifestName = "_stats.grft-manifest"

  /** Label-dictionary cap: files with more distinct labels than this
    * drop the dictionary (None) and prune by min/max alone — the
    * parquet/ORC dictionary-page fallback rule, keeping manifest lines
    * bounded no matter the data. 64 covers any classification-style
    * label column (CIFAR's is 10) with a ~6× margin. */
  val LabelDictCap = 64

  /** Per-file vec_id Bloom filter (the parquet bloom-filter analogue):
    * 16384 bits under the engine's SQL-replayable hash family
    * ([[org.apache.spark.sql.graft.BloomFilterAgg]]), packed 64 bits
    * per long here (manifest-internal — no cross-engine division rides
    * these words). Kept only for files of ≤ [[BloomRowCap]] rows so the
    * fill stays ≤ ~40% (fpp ≲ 2.5%); larger files drop it and prune by
    * min/max alone — the same bounded-metadata rule as the label
    * dictionary. Point lookups on vec_id skip files whose min/max
    * BRACKETS the probe but whose bloom lacks it — the case range
    * stats can never win when ids interleave across files. */
  val BloomRowCap = 2048
  val BloomWords64: Int = org.apache.spark.sql.graft.BloomFilterAgg.Bits / 64

  /** @param labels distinct labels in the file when ≤ [[LabelDictCap]];
    *               None = dictionary overflowed or a pre-dictionary
    *               manifest line (both degrade to min/max pruning).
    * @param bloom  vec_id bloom when the file has ≤ [[BloomRowCap]]
    *               rows; None degrades to min/max pruning. */
  final case class FileStats(vecMin: Long, vecMax: Long,
      labelMin: Int, labelMax: Int, labels: Option[Set[Int]] = None,
      bloom: Option[Array[Long]] = None)

  private[graft] def bloomMayContain(bloom: Array[Long], key: Long): Boolean = {
    import org.apache.spark.sql.graft.{BloomFilterAgg => BF, CountMinSketchAgg => CMS}
    // a stored bloom implies every inserted key was in the hash domain,
    // so an out-of-domain probe was definitionally never inserted
    if (key < 0 || key >= CMS.KeyBound) false
    else (0 until BF.NumHashes).forall { j =>
      val pos = BF.position(key, j)
      ((bloom(pos >> 6) >> (pos & 63)) & 1L) == 1L
    }
  }

  private[graft] def readManifest(dir: Path): Map[String, FileStats] = {
    val p = new Path(dir, ManifestName)
    val f = fs(p)
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      try {
        def parseDict(e: String): Option[Set[Int]] =
          if (e == "-") None
          else Some(e.split(',').filter(_.nonEmpty).map(_.toInt).toSet)
        def parseBloom(bl: String): Option[Array[Long]] =
          if (bl == "-") None
          else {
            val bytes = java.util.Base64.getDecoder.decode(bl)
            val bb = java.nio.ByteBuffer.wrap(bytes)
            val ws = Array.fill(bytes.length / 8)(bb.getLong)
            if (ws.length == BloomWords64) Some(ws) else None // advisory
          }
        scala.io.Source.fromInputStream(in, "UTF-8").getLines().flatMap { l =>
          l.split('\t') match {
            case Array(name, a, b, c, d) => // pre-dictionary line: advisory
              Some(name -> FileStats(a.toLong, b.toLong, c.toInt, d.toInt))
            case Array(name, a, b, c, d, e) => // pre-bloom line: advisory
              Some(name -> FileStats(a.toLong, b.toLong, c.toInt, d.toInt,
                parseDict(e)))
            case Array(name, a, b, c, d, e, bl) =>
              Some(name -> FileStats(a.toLong, b.toLong, c.toInt, d.toInt,
                parseDict(e), parseBloom(bl)))
            case _ => None // unknown line shape: ignore (advisory contract)
          }
        }.toMap
      } finally in.close()
    }
  }

  private[sources] def writeManifest(dir: Path, entries: Map[String, FileStats]): Unit = {
    val f = fs(dir)
    val tmp = new Path(dir, s".$ManifestName.tmp")
    val out = new DataOutputStream(f.create(tmp, true))
    try entries.toSeq.sortBy(_._1).foreach { case (n, st) =>
      val dict = st.labels.map(_.toSeq.sorted.mkString(",")).getOrElse("-")
      val bl = st.bloom.map { ws =>
        val bb = java.nio.ByteBuffer.allocate(ws.length * 8)
        ws.foreach(bb.putLong)
        java.util.Base64.getEncoder.encodeToString(bb.array())
      }.getOrElse("-")
      out.write(s"$n\t${st.vecMin}\t${st.vecMax}\t${st.labelMin}\t${st.labelMax}\t$dict\t$bl\n"
        .getBytes("UTF-8"))
    } finally out.close()
    val fin = new Path(dir, ManifestName)
    // delete-then-rename: a crash in between leaves NO manifest, which
    // readers treat as "scan everything" — the safe failure direction
    f.delete(fin, false)
    require(f.rename(tmp, fin), s"grft manifest rename $tmp -> $fin failed")
  }

  /** Can a file whose scalar columns span the given ranges contain any
    * row satisfying the pushed filter? (min/max pruning — the same
    * satisfiability test parquet row-group skipping runs — refined for
    * `label` by the per-file dictionary when present: a file whose
    * label range BRACKETS the probe but whose dictionary lacks it still
    * prunes, the dictionary-page trick that matters for sparse label
    * sets.) */
  private[sources] def rangeMaySatisfy(f: Filter, st: FileStats): Boolean = {
    def rng(a: String): (Long, Long) =
      if (a == "vec_id") (st.vecMin, st.vecMax)
      else (st.labelMin.toLong, st.labelMax.toLong)
    // dictionary refinement: exact satisfiability over the ≤ 64-entry
    // label set, for every comparison shape — strictly at least as
    // strong as the min/max test it replaces
    def dictMay(p: Long => Boolean): Option[Boolean] =
      st.labels.map(_.exists(l => p(l.toLong)))
    f match {
      // bloom refinement for vec_id point lookups, ANDed with the
      // min/max bracket: a bloom false positive on a key outside
      // [min,max] must still prune (bloom ∧ range is strictly at least
      // as strong as either test alone)
      case EqualTo("vec_id", v) if st.bloom.isDefined =>
        bloomMayContain(st.bloom.get, asLong(v)) &&
          asLong(v) >= st.vecMin && asLong(v) <= st.vecMax
      case EqualTo("label", v) =>
        dictMay(_ == asLong(v)).getOrElse(
          asLong(v) >= st.labelMin && asLong(v) <= st.labelMax)
      case GreaterThan("label", v) => dictMay(_ > asLong(v)).getOrElse(rng("label")._2 > asLong(v))
      case GreaterThanOrEqual("label", v) => dictMay(_ >= asLong(v)).getOrElse(rng("label")._2 >= asLong(v))
      case LessThan("label", v) => dictMay(_ < asLong(v)).getOrElse(rng("label")._1 < asLong(v))
      case LessThanOrEqual("label", v) => dictMay(_ <= asLong(v)).getOrElse(rng("label")._1 <= asLong(v))
      case EqualTo(a, v) => val (mn, mx) = rng(a); asLong(v) >= mn && asLong(v) <= mx
      case GreaterThan(a, v) => rng(a)._2 > asLong(v)
      case GreaterThanOrEqual(a, v) => rng(a)._2 >= asLong(v)
      case LessThan(a, v) => rng(a)._1 < asLong(v)
      case LessThanOrEqual(a, v) => rng(a)._1 <= asLong(v)
      case _ => true
    }
  }

  private[sources] def fs(p: Path): FileSystem = p.getFileSystem(new Configuration())

  /** Filters this source can evaluate at the scan: comparisons on the
    * two scalar fields, plus IsNotNull (vacuous — the format is
    * non-null). Everything else stays residual for Spark. */
  private[sources] def supportedFilter(f: Filter): Boolean = f match {
    case EqualTo(a, _) => a == "vec_id" || a == "label"
    case GreaterThan(a, _) => a == "vec_id" || a == "label"
    case GreaterThanOrEqual(a, _) => a == "vec_id" || a == "label"
    case LessThan(a, _) => a == "vec_id" || a == "label"
    case LessThanOrEqual(a, _) => a == "vec_id" || a == "label"
    case IsNotNull(a) => a == "vec_id" || a == "label" || a == "embedding"
    case _ => false
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(s"non-integral literal $other")
  }

  /** Evaluate a pushed filter against the two scalar fields. */
  private[sources] def eval(f: Filter, vecId: Long, label: Int): Boolean = {
    def field(a: String): Long = if (a == "vec_id") vecId else label.toLong
    f match {
      case EqualTo(a, v) => field(a) == asLong(v)
      case GreaterThan(a, v) => field(a) > asLong(v)
      case GreaterThanOrEqual(a, v) => field(a) >= asLong(v)
      case LessThan(a, v) => field(a) < asLong(v)
      case LessThanOrEqual(a, v) => field(a) <= asLong(v)
      case IsNotNull(_) => true
      case _ => true
    }
  }
}

class GrftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "grft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Grft.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "grft source requires a path")
    new GrftTable(path)
  }
}

class GrftTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"grft:$path"
  override def schema(): StructType = Grft.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GrftScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GrftWriteBuilder(path, info)
}

// ── read side ─────────────────────────────────────────────────────────

class GrftScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var required: StructType = Grft.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var countOnly = false

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(Grft.supportedFilter)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  // per-partition cap — partial by construction (isPartiallyPushed
  // default true keeps Spark's global limit on top)
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  /** COUNT(*) from file metadata: with fixed-width rows the row count
    * is (size − header) / width per file — a 100 TB count never reads a
    * data byte. Only when nothing else conditions the rows (no pushed
    * filters, no grouping, no limit); PARTIAL pushdown (one count row
    * per file, Spark's final agg sums them), so multi-file directories
    * need no single-reader funnel. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = pushed.isEmpty && limit < 0 &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) countOnly = true
    ok
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = false

  override def build(): Scan = new GrftScan(path, required, pushed, limit, countOnly)
}

/** One row-aligned byte range of one file. */
case class GrftInputPartition(file: String, dim: Int, startRow: Long,
    numRows: Long) extends InputPartition

/** One pre-counted file in COUNT(*) pushdown mode. */
case class GrftCountPartition(rows: Long) extends InputPartition

class GrftScan(path: String, required: StructType, pushed: Array[Filter],
    limit: Int, countOnly: Boolean)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType =
    if (countOnly) StructType(Seq(StructField("count_star", LongType, nullable = false)))
    else required
  override def toBatch: Batch = this
  override def description(): String =
    s"grft:$path, PushedFilters: [${pushed.mkString(", ")}]" +
      (if (limit >= 0) s", PushedLimit: $limit" else "") +
      (if (countOnly) ", PushedAggregates: [COUNT(*)]" else "")

  /** (file, dim, rowCount) for every non-empty data file. */
  private lazy val fileRows: Seq[(String, Int, Long)] = {
    val dir = new Path(path)
    val fs = Grft.fs(dir)
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".grft")).toSeq
      .flatMap { st =>
        val dim = readHeader(fs, st.getPath)
        val dataBytes = st.getLen - Grft.HeaderBytes
        if (dataBytes <= 0) None
        else {
          val w = Grft.rowWidth(dim)
          require(dataBytes % w == 0,
            s"${st.getPath}: ${st.getLen} bytes is not header + whole rows of width $w")
          Some((st.getPath.toString, dim, dataBytes / w))
        }
      }
  }

  /** File-metadata statistics (exact rows and bytes for an unfiltered
    * scan) — what lets Catalyst broadcast-plan a small GRFT table
    * instead of assuming the default unknown size. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(fileRows.map { case (_, d, n) => n * Grft.rowWidth(d).toLong }.sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(fileRows.map(_._3).sum)
  }

  // ── runtime (join-driven) file pruning — the DSv2 DPP analogue ──────
  // VERDICT r11 task 7: Catalyst's PartitionPruning rule sees these
  // attributes, and when a selective equi-join builds its small side
  // first it hands the build-side key set back here as an In() filter
  // BEFORE planInputPartitions runs — so a dimension join prunes GRFT
  // files at EXECUTION time by the same manifest satisfiability test
  // static filters use (min/max ∧ label dictionary ∧ vec_id bloom).
  // Purely an access-path optimization: surviving rows still flow
  // through the real join, so a missed prune can never change results.
  private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("vec_id"), Expressions.column("label"))

  override def filter(filters: Array[Filter]): Unit = { runtimeFilters = filters }

  /** A runtime In() is satisfiable iff ANY of its values is; everything
    * else defers to the static per-value test. Unknown shapes keep the
    * file (advisory contract, same as a missing manifest entry). */
  private def runtimeMaySatisfy(f: Filter, st: Grft.FileStats): Boolean = f match {
    // a null build-side key never matches an equi-join, so it proves
    // nothing about the file — skip it rather than let asLong throw and
    // fail the scan at planning time (advisory contract: unknown values
    // keep the file, and if ONLY nulls arrive no non-null value can
    // match, but conservatively keep the file — result-safe either way)
    case In(a, vs) =>
      val nonNull = vs.filter(_ != null)
      nonNull.isEmpty || nonNull.exists(v => Grft.rangeMaySatisfy(EqualTo(a, v), st))
    case other if Grft.supportedFilter(other) => Grft.rangeMaySatisfy(other, st)
    case _ => true
  }

  /** [[fileRows]] minus files the stats manifest proves cannot hold a
    * row passing the pushed + runtime filters — at 100 TB this is the
    * difference between "scan the directory" and "open the two files
    * whose vec_id range brackets the lookup" (a range-partitioned write
    * gives every file a tight disjoint range). Files without a manifest
    * entry are kept (advisory contract). Recomputed per call because
    * runtime filters arrive between build and execution. */
  private def prunedFileRows: Seq[(String, Int, Long)] = {
    if (pushed.isEmpty && runtimeFilters.isEmpty) fileRows
    else {
      val manifest = Grft.readManifest(new Path(path))
      fileRows.filter { case (file, _, _) =>
        manifest.get(new Path(file).getName) match {
          case Some(st) => pushed.forall(Grft.rangeMaySatisfy(_, st)) &&
            runtimeFilters.forall(runtimeMaySatisfy(_, st))
          case None => true
        }
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (countOnly) {
      // a directory of only header-only files must still produce ONE
      // zero-count row: Spark's partial-pushdown final Sum over zero
      // input partitions would yield NULL, not 0
      // (countOnly implies pushed.isEmpty, so no pruning interplay)
      if (fileRows.isEmpty)
        return Array(GrftCountPartition(0L): InputPartition)
      return fileRows.map(f => GrftCountPartition(f._3): InputPartition).toArray
    }
    val target = SQLConf.get.filesMaxPartitionBytes
    prunedFileRows.flatMap { case (file, dim, nRows) =>
      val w = Grft.rowWidth(dim)
      val rowsPerSplit = math.max(1L, target / w)
      (0L until nRows by rowsPerSplit).map { start =>
        GrftInputPartition(file, dim, start, math.min(rowsPerSplit, nRows - start))
      }
    }.toArray
  }

  private def readHeader(fs: FileSystem, p: Path): Int = {
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](Grft.HeaderBytes)
      in.readFully(0L, buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      require(bb.getInt() == Grft.Magic, s"$p is not a GRFT file")
      require(bb.getInt() == Grft.Version, s"$p: unsupported GRFT version")
      bb.getInt() // dim
    } finally in.close()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GrftReaderFactory(required.fieldNames, pushed, limit)
}

class GrftReaderFactory(requiredNames: Array[String], pushed: Array[Filter],
    limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case GrftCountPartition(rows) => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val n = !emitted; emitted = true; n }
        override def get(): InternalRow = InternalRow(rows)
        override def close(): Unit = ()
      }
      case p: GrftInputPartition =>
        new GrftPartitionReader(p, requiredNames, pushed, limit)
    }
}

class GrftPartitionReader(p: GrftInputPartition, requiredNames: Array[String],
    pushed: Array[Filter], limit: Int) extends PartitionReader[InternalRow] {
  private val w = Grft.rowWidth(p.dim)
  private val needEmbedding = requiredNames.contains("embedding")
  private val in = {
    val path = new Path(p.file)
    val s = Grft.fs(path).open(path)
    s.seek(Grft.HeaderBytes + p.startRow * w)
    s
  }
  private val rowBuf = new Array[Byte](w)
  private val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
  private var remaining = p.numRows
  private var emitted = 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (remaining > 0 && (limit < 0 || emitted < limit)) {
      remaining -= 1
      in.readFully(rowBuf)
      bb.position(0)
      val vecId = bb.getLong
      val label = bb.getInt
      if (pushed.forall(Grft.eval(_, vecId, label))) {
        // assemble only the projected fields, in Spark's required order
        val values = requiredNames.map {
          case "vec_id" => vecId
          case "label" => label
          case "embedding" =>
            val arr = new Array[Float](p.dim)
            var i = 0
            while (i < p.dim) { arr(i) = bb.getFloat(12 + 4 * i); i += 1 }
            new GenericArrayData(arr)
        }
        current = InternalRow.fromSeq(values.toIndexedSeq)
        emitted += 1
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = in.close()

  // silence an unused warning without the parse when pruned
  require(needEmbedding || true)
}

// ── write side ────────────────────────────────────────────────────────

class GrftWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new GrftWrite(path, info.schema(), doTruncate)
}

class GrftWrite(path: String, schema: StructType, doTruncate: Boolean)
    extends Write with BatchWrite {
  // validate by NAME (any column order writes canonically)
  require(schema.fieldNames.sorted.sameElements(Grft.Schema.fieldNames.sorted) &&
    Grft.Schema.fields.forall(f =>
      schema.fields.exists(g => g.name == f.name &&
        g.dataType.catalogString == f.dataType.catalogString)),
    s"grft sink requires columns ${Grft.Schema.simpleString}, got ${schema.simpleString}")

  override def toBatch: BatchWrite = this

  // Durability discipline: tasks write to DOT-INVISIBLE staging names
  // (readers list only "*.grft", staging ends ".grft.inprogress"), and
  // ALL destructive work happens in the driver-side commit() — truncate
  // deletes the old files and staged files rename to their final names
  // only after every task has succeeded. A failed job therefore leaves
  // the previous table intact, and a zombie (crashed-then-retried) task
  // leaves at most an invisible staging file, never a duplicate data
  // file. (Single-writer format: concurrent writers to one directory
  // are not supported, as with any file sink without a commit
  // coordinator.)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    Grft.fs(dir).mkdirs(dir)
    val idx = Map(
      "vec_id" -> schema.fieldIndex("vec_id"),
      "label" -> schema.fieldIndex("label"),
      "embedding" -> schema.fieldIndex("embedding"))
    new GrftWriterFactory(path, idx("vec_id"), idx("label"), idx("embedding"))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = Grft.fs(dir)
    val staged = messages.collect { case GrftCommit(f, _) => new Path(f) }
    // Crash-ordering: make the NEW data visible first, THEN delete the
    // old generation. A driver crash mid-commit leaves a mixed table
    // (old ∪ new rows — recoverable garbage), never an empty one; the
    // reverse order had a window where the previous table was gone
    // while the new data was still invisible. Task-level failures never
    // reach here at all (staging names are dot-invisible to readers).
    val commits = messages.collect { case c: GrftCommit => c }
    val committed = staged.map { s =>
      val fin = new Path(dir, s.getName.stripSuffix(".inprogress"))
      require(fs.rename(s, fin), s"grft commit: rename $s -> $fin failed")
      fin.getName
    }.toSet
    if (doTruncate && fs.exists(dir))
      fs.listStatus(dir)
        .filter { st =>
          st.getPath.getName.endsWith(".grft") &&
            !committed.contains(st.getPath.getName)
        }
        .foreach(st => fs.delete(st.getPath, false))
    // Stats manifest: new entries from the task commit messages (min/max
    // tracked while streaming — zero extra reads); surviving prior
    // entries kept on append, dropped on truncate. Written LAST: if the
    // driver dies anywhere above, the stale/absent manifest only costs
    // skipping (readers scan unlisted files fully), never correctness.
    val prior =
      if (doTruncate) Map.empty[String, Grft.FileStats]
      else Grft.readManifest(dir) -- committed
    val fresh = commits.flatMap { c =>
      val fin = new Path(c.file).getName.stripSuffix(".inprogress")
      c.stats.map(fin -> _)
    }.toMap
    Grft.writeManifest(dir, prior ++ fresh)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = Grft.fs(new Path(path))
    messages.collect { case GrftCommit(f, _) =>
      fs.delete(new Path(f), false)
    }
  }
}

case class GrftCommit(file: String, stats: Option[Grft.FileStats] = None)
    extends WriterCommitMessage

class GrftWriterFactory(path: String, iVec: Int, iLabel: Int, iEmb: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GrftDataWriter(path, partitionId, taskId, iVec, iLabel, iEmb)
}

class GrftDataWriter(path: String, partitionId: Int, taskId: Long,
    iVec: Int, iLabel: Int, iEmb: Int) extends DataWriter[InternalRow] {
  private val file = new Path(path,
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.grft.inprogress")
  private val out = new DataOutputStream(
    new BufferedOutputStream(Grft.fs(file).create(file, true), 1 << 16))
  private var dim = -1
  private var rowBuf: ByteBuffer = _

  private def writeHeader(d: Int): Unit = {
    val h = ByteBuffer.allocate(Grft.HeaderBytes).order(ByteOrder.LITTLE_ENDIAN)
    h.putInt(Grft.Magic).putInt(Grft.Version).putInt(d).putInt(0)
    out.write(h.array())
    dim = d
    rowBuf = ByteBuffer.allocate(Grft.rowWidth(d)).order(ByteOrder.LITTLE_ENDIAN)
  }

  // streaming min/max + bounded label dictionary for the stats
  // manifest — free at write time
  private var vecMin = Long.MaxValue
  private var vecMax = Long.MinValue
  private var labelMin = Int.MaxValue
  private var labelMax = Int.MinValue
  private val labelDict = scala.collection.mutable.Set.empty[Int]
  private var dictOverflow = false
  private val bloomWords = new Array[Long](Grft.BloomWords64)
  private var bloomRows = 0L // > BloomRowCap drops the bloom (fill bound)

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(iVec) && !row.isNullAt(iLabel) && !row.isNullAt(iEmb),
      "grft format is non-null")
    val emb = row.getArray(iEmb)
    if (dim < 0) writeHeader(emb.numElements())
    require(emb.numElements() == dim,
      s"ragged embedding: expected $dim floats, got ${emb.numElements()}")
    rowBuf.position(0)
    val vecId = row.getLong(iVec)
    val label = row.getInt(iLabel)
    vecMin = math.min(vecMin, vecId); vecMax = math.max(vecMax, vecId)
    labelMin = math.min(labelMin, label); labelMax = math.max(labelMax, label)
    if (!dictOverflow) {
      labelDict += label
      if (labelDict.size > Grft.LabelDictCap) { labelDict.clear(); dictOverflow = true }
    }
    // vec_id bloom: free at write time; an id outside the replayable
    // hash domain or a file past the row cap drops it (advisory)
    bloomRows += 1
    if (bloomRows <= Grft.BloomRowCap &&
        vecId >= 0 && vecId < org.apache.spark.sql.graft.CountMinSketchAgg.KeyBound) {
      import org.apache.spark.sql.graft.{BloomFilterAgg => BF}
      var j = 0
      while (j < BF.NumHashes) {
        val pos = BF.position(vecId, j)
        bloomWords(pos >> 6) |= (1L << (pos & 63))
        j += 1
      }
    } else bloomRows = Grft.BloomRowCap + 1 // poison: drop on commit
    rowBuf.putLong(vecId).putInt(label)
    var i = 0
    while (i < dim) { rowBuf.putFloat(emb.getFloat(i)); i += 1 }
    out.write(rowBuf.array())
  }

  override def commit(): WriterCommitMessage = {
    if (dim < 0) writeHeader(0) // empty partition: header-only file
    out.close()
    val stats =
      if (vecMin > vecMax) None // no data rows: nothing to prune on
      else Some(Grft.FileStats(vecMin, vecMax, labelMin, labelMax,
        if (dictOverflow) None else Some(labelDict.toSet),
        if (bloomRows <= Grft.BloomRowCap) Some(bloomWords) else None))
    GrftCommit(file.toString, stats)
  }
  override def abort(): Unit = {
    out.close()
    Grft.fs(file).delete(file, false)
  }
  override def close(): Unit = ()
}
