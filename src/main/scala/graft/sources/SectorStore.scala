package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.impl.ColumnReadStoreImpl
import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter}
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sector-addressed raw-vector store — the SSD layout of the reference's
  * paged tiers, rendered in parquet.
  *
  * The reference's DiskANN never scans its disk file: each raw-vector read
  * is one aligned SECTOR fetch at a known offset
  * (`src/index/diskann/diskann.cc:560-660` — the search issues
  * `beamwidth` AlignedRead IO requests per hop, each `SECTOR_LEN` bytes),
  * so per-query IO is proportional to the FETCH COUNT, never to the corpus.
  * The parquet analog of a sector is a ROW GROUP: [[save]] lays the raw
  * tier out globally range-partitioned and sorted by id with deliberately
  * small row groups, and [[Reader]] keeps only the footer metadata resident
  * (per-row-group (min, max) id fences — the "sector table") and reads
  * exactly the row groups that contain requested ids, through
  * parquet-mr's own `ParquetFileReader.readRowGroup`. No Spark job runs on
  * the fetch path — a serving node reads bytes from index files, it does
  * not schedule cluster work per query.
  *
  * Because the layout is globally sorted and ids are unique, every id maps
  * to at most ONE row group, so a fetch of `w` distinct ids reads at most
  * `w` sectors (exactly `hit-group count` — adjacent ids share groups) of
  * ~`rowsPerGroup` rows each, whatever the corpus size. The Reader verifies
  * the sorted-disjoint fence invariant at open and refuses unsorted files,
  * so a store can never silently degrade to a scan.
  */
object SectorStore {

  /** One row group's manifest entry: the resident "sector table" row. */
  final case class Sector(
      fileIdx: Int,
      blockIdx: Int,
      minId: Long,
      maxId: Long,
      rows: Long,
      compressedBytes: Long)

  /** No-op converter tree for the fixed (id LONG, vec LIST<FLOAT>)
    * shape — `ColumnReadStoreImpl` binds a primitive converter per
    * column at construction; the decode loops below pull values with
    * `getLong`/`getFloat` directly, so the converters never fire (no
    * per-value object allocation — the example `GroupRecordConverter`
    * allocates a Group PER LIST ELEMENT and measured 3.4× slower). */
  private def noopConverter(idIdx: Int, vecIdx: Int): GroupConverter = {
    val prim = new PrimitiveConverter {
      override def addLong(v: Long): Unit = ()
      override def addFloat(v: Float): Unit = ()
      override def addInt(v: Int): Unit = ()
      override def addBinary(v: Binary): Unit = ()
    }
    // Spark's standard 3-level list: vec { repeated list { element } }
    val listEntry = new GroupConverter {
      def getConverter(i: Int): Converter = prim
      def start(): Unit = ()
      def end(): Unit = ()
    }
    val vec = new GroupConverter {
      def getConverter(i: Int): Converter = listEntry
      def start(): Unit = ()
      def end(): Unit = ()
    }
    new GroupConverter {
      def getConverter(i: Int): Converter = if (i == vecIdx) vec else prim
      def start(): Unit = ()
      def end(): Unit = ()
    }
  }

  /** Concurrent sector-IO pool — the serving analog of the reference's
    * beamwidth IO: DiskANN issues its per-hop sector reads as CONCURRENT
    * AlignedReads (`diskann.cc:560-660`), so a fetch that touches many
    * sectors must not pay them serially. Distinct FILES read in
    * parallel (each file handle has its own stream monitor). Daemon
    * threads; never submits back into itself, so callers on other pools
    * (the routers' scatter pool) cannot deadlock through it. */
  private lazy val ioPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      // sized to the full core count (was cores/2 capped at 16): at t8
      // client threads each search has beamwidth sector reads in flight,
      // so the shared pool must cover clients × beamwidth or the IO
      // concurrency the reference's aligned reads get collapses to the
      // pool size — the measured t4 QPS saturation
      math.min(32, math.max(2, Runtime.getRuntime.availableProcessors())),
      (r: Runnable) => {
        val t = new Thread(r, "graft-sector-io")
        t.setDaemon(true)
        t
      })

  private[sources] def mapConcurrent[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    if (xs.lengthCompare(1) <= 0) xs.map(f)
    else
      xs.map { x =>
        ioPool.submit(new java.util.concurrent.Callable[B] { def call(): B = f(x) })
      }.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
        }
      }

  /** Write `(id, vec)` rows in sector layout: `files` range partitions
    * (disjoint id ranges), sorted by id within each, with
    * `parquet.block.size` chosen so a row group holds ~`sectorBytes` of
    * rows. The sector size follows the reference's own disk unit
    * (`SECTOR_LEN` = 4096-byte aligned reads, `diskann.cc:560-660`):
    * SMALL sectors are what make per-query IO proportional to the fetch
    * count even when the wanted ids scatter across the id space — a
    * visited set of v nodes reads ≈ v sectors ≈ v·sectorBytes, not the
    * corpus. `rowsPerGroup > 0` overrides the derived row count (tests
    * pin exact granularity with it). One shuffle, once, at save time;
    * every subsequent fetch is footer-guided random access. */
  def save(
      df: DataFrame, // (idCol LONG-castable, vecCol ARRAY<FLOAT>)
      dir: String,
      idCol: String = "id",
      vecCol: String = "vec",
      sectorBytes: Long = 8192L,
      rowsPerGroup: Int = 0,
      groupsPerFile: Int = 512): Unit = {
    val rows = df.count()
    val projected = df.select(col(idCol).cast("long").as(idCol), col(vecCol))
    if (rows == 0L) {
      projected.coalesce(1).write.mode("overwrite").parquet(dir)
      return
    }
    val dim = projected.select(size(col(vecCol))).head().getInt(0)
    // in-memory (uncompressed) bytes per buffered row — what the writer's
    // block-size check measures; +8 covers list/definition-level structure
    val bytesPerRow = 8L + 4L * dim + 8L
    val rpg: Long =
      if (rowsPerGroup > 0) rowsPerGroup.toLong
      else math.max(8L, sectorBytes / bytesPerRow)
    val blockSize = rpg * bytesPerRow
    val perFile = rpg * groupsPerFile
    val files = math.max(1L, (rows + perFile - 1L) / perFile).toInt
    projected
      .repartitionByRange(files, col(idCol))
      .sortWithinPartitions(idCol)
      .write
      .mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
      // the writer only re-checks buffered size every N records (default
      // min 100) — small sectors need a tighter check interval (these
      // page-size-check knobs also govern the ROW GROUP size check in
      // InternalParquetRecordWriter)
      .option("parquet.page.size.row.check.min",
        math.max(1L, rpg / 4L).toString)
      .option("parquet.page.size.row.check.max",
        math.max(1L, rpg / 2L).toString)
      .parquet(dir)
  }

  /** Open a store directory; None when the layout does not satisfy the
    * sorted-disjoint sector invariant (e.g. parquet written by a plain
    * unsorted save) — callers then re-materialize with [[save]]. */
  def openIfValid(
      spark: SparkSession,
      dir: String,
      idCol: String = "id",
      vecCol: String = "vec"): Option[Reader] =
    try {
      val r = new Reader(spark, dir, idCol, vecCol)
      if (r.layoutSorted) Some(r) else { r.close(); None }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Footer-manifest reader over a [[save]]d store. Resident state is the
    * sector table only (O(row groups)); vectors are paged per fetch.
    * Row-group reads synchronize on their file's reader (the underlying
    * stream seeks), distinct files read concurrently.
    */
  final class Reader(
      spark: SparkSession,
      dir: String,
      idCol: String,
      vecCol: String) extends AutoCloseable {

    private val conf: Configuration = spark.sparkContext.hadoopConfiguration
    private val fs = new Path(dir).getFileSystem(conf)
    private val paths: Array[Path] = fs
      .listStatus(new Path(dir))
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .sortBy(_.getName)
    require(paths.nonEmpty, s"no parquet files under $dir")

    /** Sector table, sorted by minId — built once from footers (readers
      * opened and closed; fetch-path readers open lazily below). */
    val sectors: Array[Sector] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Sector]
      paths.zipWithIndex.foreach { case (p, fi) =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
        try {
          val blocks = r.getFooter.getBlocks
          var bi = 0
          while (bi < blocks.size()) {
            val b = blocks.get(bi)
            var ci = 0
            var done = false
            val cols = b.getColumns
            while (ci < cols.size() && !done) {
              val cc = cols.get(ci)
              if (cc.getPath.toDotString == idCol) {
                val st = cc.getStatistics
                require(st != null && st.hasNonNullValue,
                  s"id column statistics missing in ${p.getName} block $bi — " +
                    "sector fences need min/max; rewrite the store with SectorStore.save")
                out += Sector(fi, bi,
                  st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue(),
                  b.getRowCount, b.getCompressedSize)
                done = true
              }
              ci += 1
            }
            require(done, s"id column '$idCol' not found in ${p.getName}")
            bi += 1
          }
        } finally r.close()
      }
      out.sortBy(s => (s.minId, s.maxId)).toArray
    }

    /** True when sector fences are pairwise disjoint and ascending — the
      * invariant that makes id → sector a binary search and bounds every
      * fetch to the hit groups. */
    val layoutSorted: Boolean =
      sectors.indices.drop(1).forall(i => sectors(i).minId > sectors(i - 1).maxId)

    def totalSectors: Long = sectors.length.toLong
    def totalRows: Long = sectors.iterator.map(_.rows).sum
    def totalCompressedBytes: Long = sectors.iterator.map(_.compressedBytes).sum

    // fetch-path file handles: a POOL of readers per file, not one guarded
    // by a monitor — `ParquetFileReader.readRowGroup` seeks a stateful
    // stream, so one shared reader serializes every concurrent client on
    // that file's lock (measured: 4-thread QPS collapsing BELOW the
    // 1-thread number on a single-file store — a lock convoy, not IO).
    // Borrow-or-open keeps the footer parse amortized: steady-state pool
    // size = the peak client concurrency per file, each reader reused.
    private val pools = Array.fill(paths.length)(
      new java.util.concurrent.ConcurrentLinkedQueue[ParquetFileReader]())
    @volatile private var closed = false
    private def withReader[T](fi: Int)(f: ParquetFileReader => T): T = {
      var r = pools(fi).poll()
      if (r == null)
        r = ParquetFileReader.open(HadoopInputFile.fromPath(paths(fi), conf))
      var ok = false
      try { val out = f(r); ok = true; out }
      finally {
        if (ok && !closed) pools(fi).offer(r) else r.close()
      }
    }

    // per-file decode context, built once on first touch: schema field
    // paths, converter tree, writer id — constructing these per sector
    // was a measurable share of the per-sector cost
    private final case class FileCtx(
        schema: MessageType,
        createdBy: String,
        idDesc: org.apache.parquet.column.ColumnDescriptor,
        vecDesc: org.apache.parquet.column.ColumnDescriptor,
        conv: GroupConverter)
    private val ctxs = new Array[FileCtx](paths.length)
    private def ctxFor(fi: Int, reader: ParquetFileReader): FileCtx = ctxs.synchronized {
      if (ctxs(fi) == null) {
        val md = reader.getFooter.getFileMetaData
        val schema = md.getSchema
        ctxs(fi) = FileCtx(
          schema,
          md.getCreatedBy,
          schema.getColumnDescription(Array(idCol)),
          schema.getColumnDescription(Array(vecCol, "list", "element")),
          noopConverter(schema.getFieldIndex(idCol), schema.getFieldIndex(vecCol)))
      }
      ctxs(fi)
    }

    /** Index of the sector whose fence contains `id`, or -1 (absent id —
      * ids between fences were never stored). */
    def sectorOf(id: Long): Int = {
      var lo = 0
      var hi = sectors.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val s = sectors(mid)
        if (id < s.minId) hi = mid - 1
        else if (id > s.maxId) lo = mid + 1
        else return mid
      }
      -1
    }

    /** Read a batch of sectors, DISTINCT FILES IN PARALLEL (the
      * beamwidth-IO analog — see [[SectorStore.ioPool]]), each file's
      * sectors in offset order under one lock acquisition. Wanted rows
      * go to `sink` (called concurrently across files — callers pass a
      * thread-safe sink or merge per-file results). Returns total rows
      * decoded. */
    def readSectors(
        sis: Seq[Int],
        wanted: Long => Boolean,
        sink: (Long, Array[Float]) => Unit): Long =
      mapConcurrent(sis.groupBy(si => sectors(si).fileIdx).toSeq) { case (fi, fsis) =>
        withReader(fi) { reader =>
          val ctx = ctxFor(fi, reader)
          var decoded = 0L
          fsis.sortBy(sectors(_).blockIdx).foreach { si =>
            decoded += decodeSector(reader.readRowGroup(sectors(si).blockIdx),
              ctx, wanted, sink)
          }
          decoded
        }
      }.sum

    /** Decode ONE row group straight off its column pages
      * (`ColumnReadStoreImpl` — no record-assembly state machine): ids
      * first, then the list column by repetition/definition levels;
      * float buffers materialize only for WANTED rows. */
    private def decodeSector(
        pages: PageReadStore,
        ctx: FileCtx,
        wanted: Long => Boolean,
        sink: (Long, Array[Float]) => Unit): Long = {
      val n = pages.getRowCount.toInt
      val crs = new ColumnReadStoreImpl(pages, ctx.conv, ctx.schema, ctx.createdBy)
      val idR = crs.getColumnReader(ctx.idDesc)
      val idMaxDef = ctx.idDesc.getMaxDefinitionLevel
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) {
        // loud on a null id: the fence invariant (and every batch path)
        // assumes non-null keys, so silence here would corrupt lookups
        require(idR.getCurrentDefinitionLevel == idMaxDef,
          "null id in sector store — the raw tier requires non-null keys")
        ids(i) = idR.getLong
        idR.consume()
        i += 1
      }
      val vr = crs.getColumnReader(ctx.vecDesc)
      val maxDef = ctx.vecDesc.getMaxDefinitionLevel
      val total = vr.getTotalValueCount
      var row = -1
      var want = false
      var buf = new Array[Float](64)
      var len = 0
      def flush(): Unit =
        if (row >= 0 && want) sink(ids(row), java.util.Arrays.copyOf(buf, len))
      var t = 0L
      while (t < total) {
        if (vr.getCurrentRepetitionLevel == 0) { // triplet starts a new row
          flush()
          row += 1
          want = wanted(ids(row))
          len = 0
        }
        if (vr.getCurrentDefinitionLevel == maxDef) {
          // every defined value must be read or skip()ed before consume —
          // consuming an unread value desyncs the value stream from the
          // repetition/definition streams
          if (want) {
            if (len == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
            buf(len) = vr.getFloat
            len += 1
          } else vr.skip()
        }
        vr.consume()
        t += 1
      }
      flush()
      n.toLong
    }

    override def close(): Unit = {
      closed = true
      var i = 0
      while (i < pools.length) {
        var r = pools(i).poll()
        while (r != null) { r.close(); r = pools(i).poll() }
        i += 1
      }
    }
  }
}
