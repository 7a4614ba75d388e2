package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{Merge, Sources}

/** The source/sink surface (graft.sources.Sources) as a correctness-bearing
  * query: the reference's declared I/O targets are BigQuery/Parquet/CSV
  * (data_structures.py:1770-1773), and the engine-side story for them is
  * schema-first reads plus PARTITIONED writes keyed by the natural pruning
  * column (SURVEY.md §2.3). SourcesSpec covers the format matrix
  * (CSV/JSON-lines/bucketed); this query makes the partitioned-parquet
  * path oracle-checked end to end.
  */
object SourceQueries {

  /** Fresh scratch root under the warehouse for a log-table gate query —
    * one per (query, sf) so reruns never inherit stale state.
    */
  private def scratch(s: SparkSession, dir: String, name: String): String = {
    val outRoot = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
      name + "_" + new java.io.File(dir).getName.replace('.', '_'))
    val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
    outRoot.toString
  }

  /** The shared orders shape of the q125-family log-table gates — ONE
    * definition feeding q129/q130/q131/q133, so a change to the recipe
    * cannot silently diverge a runner from its oracle copy-by-copy.
    * Integer cents (the q44 lesson: exact, order-free sums).
    */
  private def ordersShaped(s: SparkSession, dir: String,
                           withOdate: Boolean): DataFrame = {
    val cols = Seq(col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      round(col("o_totalprice") * 100).cast("long").as("cents")) ++
      (if (withOdate) Seq(col("o_orderdate").as("odate")) else Nil) ++
      Seq(year(col("o_orderdate")).as("o_year"),
        lit(0).as("version"), lit("U").as("op"))
    Tables(s, dir, "orders").select(cols: _*)
  }

  /** The shared change batch: +10% cents on every 7th key (version 1),
    * tombstone every 13th (version 2), restricted to `touched`.
    */
  private def ordersUpdDel(base: DataFrame,
                           touched: org.apache.spark.sql.Column): DataFrame =
    base.filter(col("k") % 7 === 0 && touched)
      .withColumn("cents", expr("(cents * 110) div 100"))
      .withColumn("version", lit(1))
      .unionByName(base.filter(col("k") % 13 === 0 && touched)
        .withColumn("version", lit(2)).withColumn("op", lit("D")))

  /** Multiset equality in ONE aggregation (guide §2.4 — remove
    * shuffles): the double-`exceptAll` pin costs two except-aggregates
    * plus their counts (each itself an aggregation over both sides —
    * four shuffles of the full frames); a signed union needs one.
    * Equivalent by definition: every row's +1/−1 multiplicities cancel
    * exactly when the multisets match.
    */
  private def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toIndexedSeq.map(col)
    a.select(cols: _*).withColumn("__s", lit(1L))
      .unionAll(b.select(cols: _*).withColumn("__s", lit(-1L)))
      .groupBy(cols: _*).agg(sum(col("__s")).as("__d"))
      .filter(col("__d") =!= 0L).limit(1).count() == 0L
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Round trip: events written partitioned by day, read back through a
    // date filter that prunes to the 14 selected partitions (asserted in
    // PlanAssertSpec — the scan lists the window under PartitionFilters,
    // so at 100 TB a backfill reads 14 directories, not the table), then
    // the per-day rollup. The oracle aggregates the ORIGINAL events table
    // directly: identical output proves the write→read cycle is lossless
    // (partition-column round trip included) and the pruned read complete.
    "q53_partitioned_roundtrip" -> ((s, dir) => {
      val out = "/root/repo/target/q53-roundtrip/" + new java.io.File(dir).getName
      val events = Tables(s, dir, "events")
        .withColumn("day", col("ts").cast("date"))
      Sources.writeParquet(events, out, partitionBy = Seq("day"))
      Sources.readParquet(s, out)
        .filter(col("day").between(lit("2024-01-08").cast("date"),
          lit("2024-01-21").cast("date")))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("value")), 2).as("sum_value"),
          count_distinct(col("user_id")).as("users"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cnt"), col("sum_value"), col("users"))
    }),

    // CSV round trip — the reference's declared flat-file target: events
    // written as headered CSV (quoting protects the embedded JSON payload
    // column), read back SCHEMA-FIRST (no inference scan — at 100 TB an
    // inference pass is a second full read), then aggregated. The payload
    // integrity check (sum of the numeric field extracted from the
    // round-tripped JSON string) and the oracle on the ORIGINAL parquet
    // prove the text encode/decode cycle lossless.
    "q71_csv_roundtrip" -> ((s, dir) => {
      val out = "/root/repo/target/q71-csv/" + new java.io.File(dir).getName
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("props"))
      Sources.writeCsv(ev, out)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      Sources.readCsv(s, out, schema)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"),
          count_distinct(col("user_id")).as("users"),
          sum(regexp_extract(col("props"), "[0-9]+", 0).cast("long")).as("sum_k"))
    }),

    // ORC round trip: documents through the third columnar codec
    // (bundled with Spark), schema-first read back, per-source aggregate
    // with a distinct-md5 count over the round-tripped text — byte-exact
    // survival through an entirely different storage format.
    "q100_orc_roundtrip" -> ((s, dir) => {
      val out = "/root/repo/target/q100-orc/" + new java.io.File(dir).getName
      Sources.writeOrc(Tables(s, dir, "documents"), out)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      Sources.readOrc(s, out, schema)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text").cast("binary"))).as("distinct_texts"))
    }),

    // JSON-lines round trip: documents (multi-lingual text included)
    // written as JSONL, read back schema-first, aggregated per
    // (lang, source) with a distinct-md5 count over the round-tripped
    // text — byte-exact text survival is the whole point of the check.
    "q72_jsonl_roundtrip" -> ((s, dir) => {
      val out = "/root/repo/target/q72-jsonl/" + new java.io.File(dir).getName
      Sources.writeJsonl(Tables(s, dir, "documents"), out)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      Sources.readJsonl(s, out, schema)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          count_distinct(md5(col("text").cast("binary"))).as("distinct_texts"))
    }),

    // The CAPSTONE export: the full curation pipeline ending where a real
    // training-data run ends — on disk, partitioned for consumption.
    // Score map-side → keep high-quality English → collapse exact
    // duplicates (one min_by shuffle) → deterministic md5 split
    // assignment → WRITE partitioned by split → read back ONLY the train
    // partition (directory pruning, not a filter over the full set) →
    // per-source token accounting. Every stage is an already-verified
    // operator; this query proves they compose through a round trip of
    // the export format. The oracle independently restates the whole
    // chain from the raw table.
    "q76_corpus_export" -> ((s, dir) => {
      import graft.scale.{Dedup, TextAnalysis}
      val out = "/root/repo/target/q76-export/" + new java.io.File(dir).getName
      val t = col("text")
      val ws = col("ws")
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), t, Dedup.words(t).as("ws"))
        .select(col("doc_id"), col("source"), t, ws,
          TextAnalysis.qualityMicro(t, ws).as("q_mu"),
          TextAnalysis.langIdW(ws).as("lang_guess"),
          TextAnalysis.tokenCount(t).as("n_tokens"))
        .filter(col("q_mu") >= 750000L && col("lang_guess") === "en")
        .drop("ws")
      val curated = Dedup.exactDedup(scored, Dedup.contentKey(t), col("doc_id"))
      val bucket = pmod(Dedup.md5Long60(col("doc_id")), lit(100))
      val assigned = curated
        .withColumn("split",
          when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("split"))
      Sources.writeParquet(assigned, out, partitionBy = Seq("split"))
      Sources.readParquet(s, out)
        .filter(col("split") === "train")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    }),

    // CDC merge applied to a PERSISTED partitioned table: orders landed
    // as a year-partitioned parquet table (version 0), then one change
    // batch — updates (price bump, v1), tombstones (v2, winning over a
    // same-key update), and inserts (new keys, v1) — all confined to two
    // of the seven year partitions. Merge.upsertPartitioned reads ONLY
    // the touched partitions (partition-pruned base scan) and rewrites
    // ONLY their directories (dynamic partition overwrite) — at 100 TB a
    // daily batch touching 3 of 2,000 date partitions reads and rewrites
    // 3. The final state is read back whole and aggregated, so a lost
    // insert, an unapplied tombstone, a stale version surviving, or a
    // partition the rewrite should not have touched is hash-red. The
    // oracle restates base ∪ changes → per-key argmax → tombstone filter
    // from the raw table, plus the touched-partition count.
    "q108_partitioned_merge" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q108_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      // integer CENTS end-to-end (the q44 lesson): a double price sum is
      // order-dependent across file layouts — 1-ulp at a rounding
      // boundary is hash-red (q115 caught exactly this). Cents sums are
      // exact and order-independent.
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        lit(0).as("version"), lit("U").as("op"))
      Sources.writeParquet(base, outRoot.toString, partitionBy = Seq("o_year"))
      val inYears = col("o_year").isin(1997, 1999)
      val upd = base.filter(col("o_orderkey") % 7 === 0 && inYears)
        .withColumn("cents", expr("(cents * 110) div 100"))
        .withColumn("version", lit(1))
      val del = base.filter(col("o_orderkey") % 13 === 0 && inYears)
        .withColumn("version", lit(2))
        .withColumn("op", lit("D"))
      val ins = base.filter(col("o_orderkey") % 11 === 0 && inYears)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("cents", expr("cents div 2"))
        .withColumn("version", lit(1))
      val stats = Merge.upsertPartitioned(s, outRoot.toString,
        upd.unionByName(del).unionByName(ins),
        keyCols = Seq("o_orderkey"), orderCols = Seq("version"),
        partitionCol = "o_year", opCol = "op")
      Sources.readParquet(s, outRoot.toString)
        .groupBy(col("o_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("parts_touched", lit(stats.partitionsTouched))
    }),

    // SCD2 history from a change feed: the events stream read as a
    // per-user attribute feed, change-compressed (consecutive rows with
    // the same tracked attribute open no new version), each survivor
    // becoming a validity interval closed by the next change — the
    // lag/lead passes share one (user, ts) sort, so the whole history
    // build is a single shuffle. Aggregated per attribute value over
    // interval counts, current-row counts, and exact microsecond
    // durations: a dropped change row, a mis-closed interval, or a
    // compression bug shifts the sums and is hash-red.
    "q109_scd2_history" -> ((s, dir) => {
      val feed = Tables(s, dir, "events")
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_type")).as("etype"))
      Merge.scd2(feed, keyCols = Seq("user_id"), tsCol = "ts",
          attrCols = Seq("etype"))
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n_intervals"),
          count(when(col("is_current"), 1)).as("n_current"),
          coalesce(sum(unix_micros(col("valid_to")) -
            unix_micros(col("valid_from"))), lit(0L)).as("sum_dur_us"))
    }),

    // Incremental SCD2 maintenance — the daily-batch form of q109: the
    // history is built from the feed BEFORE the cut, then the post-cut
    // batch is folded in with scd2Apply (closed intervals pass through
    // untouched via a broadcast key split; only open rows + the batch
    // re-enter the window). The ORACLE IS THE BATCH BUILD over the full
    // feed — hash equality proves the incremental path is exactly
    // equivalent to recomputing from scratch, which is the entire
    // contract of incremental dimension maintenance at 100 TB (recompute
    // cost O(batch), result indistinguishable from a rebuild).
    "q110_scd2_incremental" -> ((s, dir) => {
      val feed = Tables(s, dir, "events")
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_type")).as("etype"))
      val cut = lit("2024-01-20").cast("timestamp")
      val history = Merge.scd2(feed.filter(col("ts") < cut),
        keyCols = Seq("user_id"), tsCol = "ts", attrCols = Seq("etype"))
      Merge.scd2Apply(history, feed.filter(col("ts") >= cut),
          keyCols = Seq("user_id"), tsCol = "ts", attrCols = Seq("etype"))
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n_intervals"),
          count(when(col("is_current"), 1)).as("n_current"),
          coalesce(sum(unix_micros(col("valid_to")) -
            unix_micros(col("valid_from"))), lit(0L)).as("sum_dur_us"))
    }),

    // Range-sorted export: documents written globally ordered by doc_id
    // across 8 disjoint-range parquet files (sampled boundaries — a
    // RangePartitioning exchange, NEVER a global sort), then the per-file
    // manifest is folded into one row of invariants: file count, row
    // total, key checksum, and the DISJOINTNESS bit (every file's min
    // strictly above the previous file's max — the contract that lets a
    // downstream range predicate prune to one file). The oracle restates
    // the totals from the source table and pins the invariant bits at
    // TRUE: a boundary overlap, a dropped row, or a wrong file count is
    // hash-red. The manifest window runs over n_files rows, not data.
    "q111_range_sorted_export" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q111_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      Sources.writeRangeSorted(docs, outRoot.toString, "doc_id", numFiles = 8)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("min_key"))
      Sources.rangeManifest(s, outRoot.toString, "doc_id")
        .withColumn("prev_max", lag(col("max_key"), 1).over(w))
        .agg(
          // range partitions that sample to an empty key range write no
          // file, so the COUNT is bounded by numFiles, not pinned to it —
          // the invariant is 1..numFiles, asserted engine-side as a bit
          (count(lit(1)).between(1, 8)).as("files_ok"),
          sum(col("n")).as("n_rows"),
          min(when(col("prev_max").isNull, true)
            .otherwise(col("prev_max") < col("min_key"))).as("disjoint"),
          sum(col("sum_key")).as("sum_key"))
    }),

    // Schema-evolution round trip: two epochs of orders land with
    // DIFFERENT physical schemas — epoch 1 (≤1997) has no priority column
    // and an INT quantity; epoch 2 (>1997) adds the priority column and
    // widens quantity to BIGINT. readEvolved reconciles both against the
    // declared schema (missing column → typed NULL, int → bigint lossless
    // widening) and the per-year aggregate proves it: priority counts are
    // zero exactly for the old years, the widened sums are exact. The
    // oracle restates the drift from the raw table, so a silently dropped
    // epoch column, a wrong NULL fill, or a lossy cast is hash-red.
    "q114_schema_evolution" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q114_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("o_year"),
        col("o_orderpriority"),
        (col("o_orderkey") % 50 + 1).as("qty"))
      val e1 = s"$outRoot/epoch1"
      val e2 = s"$outRoot/epoch2"
      base.filter(col("o_year") <= 1997)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_year"),
          col("qty").cast("int").as("qty"))
        .write.mode("overwrite").parquet(e1)
      base.filter(col("o_year") > 1997)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_year"),
          col("o_orderpriority").as("priority"),
          col("qty").cast("long").as("qty"))
        .write.mode("overwrite").parquet(e2)
      val declared = org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, o_totalprice DOUBLE, o_year INT, " +
          "priority STRING, qty BIGINT")
      Sources.readEvolved(s, Seq(e1, e2), declared)
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"),
          count(col("priority")).as("n_priority"),
          sum(col("qty")).as("sum_qty"))
    }),

    // Z-ORDER layout: events laid out by the bit-interleaved
    // (user-bucket, day) key through the same range-sorted writer — each
    // file's Z-interval covers a bounded rectangle of the 2-D space, so
    // a (user-range × day-range) box predicate prunes files on BOTH
    // dimensions (one-key range sort prunes only its own key; ZOrderSpec
    // measures the advantage). The interleave is plain bitwise column
    // arithmetic — fully codegen'd, and restated TERM BY TERM in the
    // oracle via the shared interleaveSql emitter, so a drifted bit
    // position in either emitter is hash-red. Layout invariants as q111.
    "q116_zorder_layout" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q116_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val ev = Tables(s, dir, "events").select(
        pmod(col("user_id"), lit(64)).as("xb"),
        dayofmonth(col("ts")).as("yb"))
        .withColumn("z", graft.functions.ZOrder.interleave(col("xb"), col("yb"), bits = 8))
      Sources.writeRangeSorted(ev, outRoot.toString, "z", numFiles = 16)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("min_key"))
      Sources.rangeManifest(s, outRoot.toString, "z")
        .withColumn("prev_max", lag(col("max_key"), 1).over(w))
        .agg(
          (count(lit(1)).between(1, 16)).as("files_ok"),
          sum(col("n")).as("n_rows"),
          min(when(col("prev_max").isNull, true)
            .otherwise(col("prev_max") <= col("min_key"))).as("disjoint"),
          sum(col("sum_key")).as("sum_z"))
    }),

    // The shard round trip through the DataSource V2 reader — q107's
    // contract via `spark.read.format("graft-shards")`: shards planned as
    // real input partitions (one per shard file) and column pruning
    // pushed into the scan (ShardSourceSpec pins both). Same oracle shape
    // as q106/q107 on its own doc subset: a torn shard, a dropped entry,
    // or a byte drift through the DSv2 path is hash-red.
    "q119_shard_dsv2" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q119_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val docs = Tables(s, dir, "documents").filter(col("doc_id") % 10 === 7)
      graft.scale.Multimodal.exportPayloadShards(docs, "doc_id",
        col("text").cast("binary"), outRoot.toString, maxShardBytes = 64L << 10)
      s.read.format("graft-shards").load(outRoot.toString)
        .select(
          regexp_extract(col("name"), "(-?[0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("payload_md5"))
    }),

    // Single-id lookups through the shard DSv2's FILTER pushdown — the
    // point of the per-shard entry manifest: the IN predicate on `name`
    // is consumed by the source, shards whose manifest rules out every
    // wanted id are never planned (ShardSourceSpec pins the partition
    // count and the bytesSkipped/entriesRead evidence), and within
    // surviving shards only the matching bodies are read. The layout is
    // NESTED (bucket=even/ bucket=odd/ subtrees) so the recursive shard
    // listing is itself under the hash gate. The oracle restates the
    // same id set from the source table — a dropped shard subtree, an
    // over-eager manifest prune, or a filter mis-eval loses rows and
    // goes hash-red.
    "q123_shard_pushdown_lookup" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q123_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val docs = Tables(s, dir, "documents")
      graft.scale.Multimodal.exportPayloadShards(
        docs.filter(col("doc_id") % 2 === 0), "doc_id",
        col("text").cast("binary"), s"$outRoot/bucket=even",
        maxShardBytes = 64L << 10)
      graft.scale.Multimodal.exportPayloadShards(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id",
        col("text").cast("binary"), s"$outRoot/bucket=odd",
        maxShardBytes = 64L << 10)
      val wanted = (7L to 97L by 10L).map(i => s"$i.bin")
      s.read.format("graft-shards").load(outRoot.toString)
        .filter(col("name").isin(wanted: _*))
        .select(
          regexp_extract(col("name"), "(-?[0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("payload_md5"))
    }),

    // The COMMIT-LOG table — q108's merge semantics on the transactional
    // layout (write-once data files + atomic commit rename, no
    // stage-then-publish double write): base orders become version 1,
    // the same update/tombstone/insert batch q108 derives lands as one
    // log transaction (version 2), and the snapshot read restates q108's
    // oracle plus the pinned final version. A lost row through the
    // file-level rewrite, a mis-pruned spanning file, or a phantom commit
    // is hash-red.
    "q125_logtable_merge" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q125_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      def shape(df: DataFrame): DataFrame = df.select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        lit(0).as("version"), lit("U").as("op"))
      val base = shape(Tables(s, dir, "orders"))
      graft.sources.LogTable.create(s, outRoot.toString, base, "o_year")
      val inYears = col("o_year").isin(1997, 1999)
      val upd = base.filter(col("k") % 7 === 0 && inYears)
        .withColumn("cents", expr("(cents * 110) div 100"))
        .withColumn("version", lit(1))
      val del = base.filter(col("k") % 13 === 0 && inYears)
        .withColumn("version", lit(2)).withColumn("op", lit("D"))
      val ins = base.filter(col("k") % 11 === 0 && inYears)
        .withColumn("k", col("k") + lit(10000000L))
        .withColumn("status", lit("N"))
        .withColumn("cents", expr("cents div 2"))
        .withColumn("version", lit(1))
      val v = graft.sources.LogTable.upsert(s, outRoot.toString,
        upd.unionByName(del).unionByName(ins),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op")
      graft.sources.LogTable.read(s, outRoot.toString)
        .groupBy(col("o_year"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("log_version", lit(v).cast("int"))
    }),

    // Time travel on the same log table: after the merge commits version
    // 2, a version-1 read must reproduce the PRE-merge table exactly —
    // the oracle aggregates the raw orders, so a vacuumed-too-early file,
    // a replay that leaks post-merge rows, or an off-by-one version pin
    // is hash-red.
    "q126_logtable_timetravel" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q126_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      def shape(df: DataFrame): DataFrame = df.select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        lit(0).as("version"), lit("U").as("op"))
      val base = shape(Tables(s, dir, "orders"))
      graft.sources.LogTable.create(s, outRoot.toString, base, "o_year")
      val changes = base.filter(col("k") % 5 === 0)
        .withColumn("cents", expr("cents div 3"))
        .withColumn("version", lit(1))
      graft.sources.LogTable.upsert(s, outRoot.toString, changes,
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit
      graft.sources.LogTable.read(s, outRoot.toString, asOf = Some(1L))
        .groupBy(col("o_year"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("version_read", lit(1))
    }),

    // DATA SKIPPING off the commit log: the table declares per-file
    // min/max stats on two NON-partition columns at create, a merge
    // rewrites the 1997 partition (fresh files must carry fresh stats),
    // and a date-range read plans only the files whose odate range can
    // match — `files_skipped` pins that the pruned plan references
    // strictly fewer files, and the aggregate restates the merged state
    // under the range predicate. A stale stat after the rewrite, a
    // lexicographic (untyped) bound compare, or a wrongly skipped file
    // is hash-red.
    "q129_logtable_skipping" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q129")
      val base = ordersShaped(s, dir, withOdate = true)
      // bloomFilterCols: point lookups on the scattered key skip at the
      // ROW-GROUP level inside the scan (parquet blooms, written by the
      // data files themselves) — declared here so the verify gate
      // exercises bloom-writing tables end-to-end; min/max skipping
      // below is unaffected
      graft.sources.LogTable.create(s, t, base,
        Seq("o_year"), Seq("odate", "cents"), bloomFilterCols = Seq("k"))
      graft.sources.LogTable.upsert(s, t,
        ordersUpdDel(base, col("o_year") === 1997),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit
      val pred = col("odate").between("1997-03-01", "1997-09-30")
      val pruned = graft.sources.LogTable.readWhere(s, t, pred)
      val skipped = pruned.inputFiles.length <
        graft.sources.LogTable.read(s, t).inputFiles.length
      pruned.groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("files_skipped", lit(skipped))
    }),

    // The log table as a FIRST-CLASS DataFrame: q129's merge + predicate
    // through LogTable.table — a FileIndex-backed parquet relation where
    // an ORDINARY .filter() prunes files via the commit log's stats
    // inside Spark's own planning (Catalyst pushdown → FileIndex
    // .listFiles), composing with the vectorized reader and codegen.
    // files_skipped pins the executed scan's numFiles metric strictly
    // under the snapshot's file count; the aggregate restates the merged
    // state under the predicate — same oracle discipline as q129, a
    // completely different read path.
    "q133_logtable_table" -> ((s, dir) => {
      val root = scratch(s, dir, "graft_q133")
      val base = ordersShaped(s, dir, withOdate = true)
      graft.sources.LogTable.create(s, root, base,
        Seq("o_year"), Seq("odate", "cents"))
      graft.sources.LogTable.upsert(s, root,
        ordersUpdDel(base, col("o_year") === 1997),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit
      val pred = col("odate").between("1997-03-01", "1997-09-30")
      val t = graft.sources.LogTable.table(s, root)
      // one probe execution surfaces the scan's numFiles metric — the
      // proof the FileIndex actually answered the pushdown with fewer
      // files (inputFiles can't show this: it reports the snapshot)
      val probe = t.filter(pred).select(col("k"))
      probe.collect(): Unit
      val exec = probe.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scanned = exec.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.map(_.metrics("numFiles").value).sum
      val total = graft.sources.LogTable.snapshot(s, root).files.length
      t.filter(pred)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("files_skipped", lit(scanned < total))
        .withColumn("via_table_api", lit(true))
    }),

    // METADATA-ONLY COUNT off the log: countWhere proves whole files in
    // or out from their stats (single-year files under the partition
    // equality, an always-true cents bound riding along) and scans only
    // the undecided boundary — decided_some/excluded_some pin that both
    // proof classes actually fired, and the count restates the merged
    // state. A count built on faith instead of proof is hash-red.
    "q134_logtable_count" -> ((s, dir) => {
      val root = scratch(s, dir, "graft_q134")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, root, base, Seq("o_year"), Seq("cents"))
      graft.sources.LogTable.upsert(s, root,
        ordersUpdDel(base, col("o_year") === 1997),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit
      val r = graft.sources.LogTable.countWhere(s, root,
        col("o_year") === 1997 && col("cents") >= 0L)
      s.range(1).select(
        lit(r.count).as("n"),
        lit(r.decidedFiles > 0).as("decided_some"),
        lit(r.excludedFiles > 0).as("excluded_some"))
    }),

    // PREDICATE DELETE as one log transaction — the GDPR-class operation:
    // stats plan the write set (only files whose ranges may hold a
    // matching 1997 row are rewritten; every other file survives BY
    // NAME), NULL-predicate rows survive, and the surviving state is
    // restated by the oracle as `WHERE NOT (pred)` over raw orders.
    // delete_ok pins the single committed version, that some files were
    // spared AND some rewritten (a blanket table rewrite or a no-op both
    // fail), making the skip claim part of the hash.
    "q136_logtable_delete" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q136")
      val base = ordersShaped(s, dir, withOdate = true)
      graft.sources.LogTable.create(s, t, base,
        Seq("o_year"), Seq("odate", "cents"))
      val before = graft.sources.LogTable.snapshot(s, t)
      val v = graft.sources.LogTable.deleteWhere(s, t,
        col("o_year") === 1997 && col("cents") < 15000000L)
      val after = graft.sources.LogTable.snapshot(s, t)
      val afterNames = after.files.map(_.name).toSet
      val spared = before.files.count(f => afterNames.contains(f.name))
      val ok = v == 2L && spared > 0 && spared < before.files.size
      graft.sources.LogTable.read(s, t)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("delete_ok", lit(ok))
    }),

    // PREDICATE UPDATE — q136's sibling completing the CRUD triple
    // (UPDATE / DELETE / MERGE): SET two columns where the predicate
    // holds, stats-planned the same way (only may-match files rewritten,
    // spared files survive by name), NULL/FALSE rows pass through
    // byte-identical. The oracle restates the update as CASE WHEN over
    // raw orders; update_ok pins one commit + spare-and-rewrite
    // accounting into the hash.
    "q137_logtable_update" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q137")
      val base = ordersShaped(s, dir, withOdate = true)
      graft.sources.LogTable.create(s, t, base,
        Seq("o_year"), Seq("odate", "cents"))
      val before = graft.sources.LogTable.snapshot(s, t)
      val v = graft.sources.LogTable.updateWhere(s, t,
        col("o_year") === 1997 && col("status") === "F",
        Map("cents" -> expr("(cents * 110) div 100"),
          "version" -> lit(1)))
      val after = graft.sources.LogTable.snapshot(s, t)
      val afterNames = after.files.map(_.name).toSet
      val spared = before.files.count(f => afterNames.contains(f.name))
      val ok = v == 2L && spared > 0 && spared < before.files.size
      graft.sources.LogTable.read(s, t)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("update_ok", lit(ok))
    }),

    // DELETION VECTORS — q136's predicate delete WITHOUT rewriting a
    // single data file: matched row positions land in sidecar vectors,
    // the data files stay byte-identical on disk, and a second
    // overlapping delete copy-forwards the vectors. dv_ok pins two
    // committed versions, ZERO new data files written (every after-file
    // name existed before), untouched partitions surviving vector-free,
    // and at least one live vector. The read restates the survivors
    // from raw orders with both predicates negated under SQL DELETE
    // semantics — a vector that misses a row, double-kills one, or
    // leaks through any read path is hash-red.
    "q138_logtable_dv_delete" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q138")
      val base = ordersShaped(s, dir, withOdate = true)
      graft.sources.LogTable.create(s, t, base,
        Seq("o_year"), Seq("odate", "cents"))
      val before = graft.sources.LogTable.snapshot(s, t)
      val v1 = graft.sources.LogTable.deleteWhere(s, t,
        col("o_year") === 1997 && col("cents") < 15000000L,
        deletionVectors = true)
      val v2 = graft.sources.LogTable.deleteWhere(s, t,
        col("o_year") === 1997 && col("cents") >= 40000000L,
        deletionVectors = true)
      val after = graft.sources.LogTable.snapshot(s, t)
      val beforeNames = before.files.map(_.name).toSet
      val noNewData = after.files.forall(f => beforeNames.contains(f.name))
      val untouchedClean = after.files
        .filter(f => f.pmin != "1997" && f.pmax != "1997")
        .forall(_.dv.isEmpty)
      val ok = v1 == 2L && v2 == 3L && noNewData && untouchedClean &&
        after.files.exists(_.dv.isDefined)
      graft.sources.LogTable.read(s, t)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("dv_ok", lit(ok))
    }),

    // DV UPDATE — q137's predicate update in Delta's deletion-vector
    // shape: ONLY the matched rows are rewritten (into fresh files);
    // their old positions die by vector; rider rows are never copied.
    // update_dv_ok pins one commit, at least one vector, at least one
    // fresh data file, and every non-1997 file surviving by name
    // vector-free. The oracle restates the update as CASE WHEN over raw
    // orders — identical to q137's, proving both write strategies meet
    // at the same answer through a different physical plan.
    "q139_logtable_dv_update" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q139")
      val base = ordersShaped(s, dir, withOdate = true)
      graft.sources.LogTable.create(s, t, base,
        Seq("o_year"), Seq("odate", "cents"))
      val before = graft.sources.LogTable.snapshot(s, t)
      val v = graft.sources.LogTable.updateWhere(s, t,
        col("o_year") === 1997 && col("status") === "F",
        Map("cents" -> expr("(cents * 110) div 100"),
          "version" -> lit(1)),
        deletionVectors = true)
      val after = graft.sources.LogTable.snapshot(s, t)
      val beforeNames = before.files.map(_.name).toSet
      val fresh = after.files.filter(f => !beforeNames.contains(f.name))
      val untouchedClean = after.files
        .filter(f => f.pmin != "1997" && f.pmax != "1997")
        .forall(f => f.dv.isEmpty && beforeNames.contains(f.name))
      val ok = v == 2L && after.files.exists(_.dv.isDefined) &&
        fresh.nonEmpty && fresh.forall(_.dv.isEmpty) && untouchedClean
      graft.sources.LogTable.read(s, t)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("update_dv_ok", lit(ok))
    }),

    // RESTORE — the metadata-only undo: a merge (v2) and a predicate
    // delete (v3) land on the table, then restore(1) re-points the live
    // set at version 1 AS version 4, no data read or written. The
    // aggregate must equal RAW orders exactly (the oracle never applies
    // the merge or the delete), while restore_ok pins that history
    // survived: the restored table is at v4, and the undone v3 state is
    // still time-travelable with its delete applied. A restore that
    // leaks a v2/v3 row, loses one, or rewrites history is hash-red.
    "q140_logtable_restore" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q140")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, t, base, Seq("o_year"), Seq("cents"))
      graft.sources.LogTable.upsert(s, t,
        ordersUpdDel(base, col("o_year") === 1997),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit
      graft.sources.LogTable.deleteWhere(s, t,
        col("o_year") === 1998 && col("cents") < 10000000L): Unit
      val v = graft.sources.LogTable.restore(s, t, 1L)
      val restoredAt3 = graft.sources.LogTable.read(s, t, asOf = Some(3L))
        .filter(col("o_year") === 1998 && col("cents") < 10000000L).count()
      val ok = v == 4L && restoredAt3 == 0L
      graft.sources.LogTable.read(s, t)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("restore_ok", lit(ok))
    }),

    // ROW-LEVEL NET CHANGE FEED — the Delta-CDF view on top of the
    // file-level feed: a merge rewrites whole files, and q130's
    // consumers must diff riders away themselves; readNetChanges does
    // it in the engine — updated keys emit pre+post images, tombstoned
    // keys a delete, and every rider row (identical content both sides)
    // cancels EXACTLY. The oracle derives the same three change sets
    // from raw orders (deletes = tombstoned keys' originals, pre/post =
    // the updated keys' old and new rows); one surviving rider, one
    // missed image, or a mis-keyed cancellation changes the counts and
    // goes hash-red.
    "q142_logtable_net_changes" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q142")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, t, base, Seq("o_year"), Seq("cents"))
      graft.sources.LogTable.upsert(s, t,
        ordersUpdDel(base, col("o_year").isin(1997, 1999)),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit
      graft.sources.LogTable.readNetChanges(s, t, 1L, 2L, Seq("k"))
        .groupBy(col("_change_type"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    }),

    // OPERATION HISTORY — the log as its own audit trail: seven
    // lifecycle operations land on one table (create, merge, DV delete,
    // purge, restore, clause merge, compaction) and history() must name
    // each commit and its dataChange flag exactly — the oracle is the
    // literal expected ledger. A mis-tagged operation, a purge or
    // compaction claiming dataChange, or a lost commit is hash-red.
    "q143_logtable_history" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q143")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, t, base, Seq("o_year"), Seq("cents"))
      graft.sources.LogTable.upsert(s, t,
        ordersUpdDel(base, col("o_year") === 1997),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit
      graft.sources.LogTable.deleteWhere(s, t,
        col("o_year") === 1997 && col("cents") % 10L < 3L,
        deletionVectors = true): Unit
      graft.sources.LogTable.purgeDeletes(s, t): Unit
      graft.sources.LogTable.restore(s, t, 1L): Unit
      val src = base.filter(col("k") % 1000 === 1)
        .withColumn("cents", col("cents") + 1L)
        .select("k", "cents", "o_year")
      graft.sources.LogTable.mergeInto(s, t, src, Seq("k"))
        .whenMatchedUpdate(Map("cents" -> "s.cents"))
        .run(): Unit
      graft.sources.LogTable.compactPartitions(s, t,
        maxFilesPerPartition = 1): Unit
      graft.sources.LogTable.history(s, t)
        .select(col("version"), col("operation"), col("data_change"))
    }),

    // Z-ORDER LAYOUT — multi-dimensional data skipping: the table is
    // created range-partitioned on the MORTON interleave of (odate,
    // cents), so each file's min/max stats bound a RECTANGLE of the 2-D
    // space and a predicate on EITHER column prunes files — where
    // lexicographic clustering would leave the second column's ranges
    // spanning everything (q129 proves the 1-D story; this is the 2-D
    // one). zorder_ok pins that a date-window read AND a cents-band
    // read each plan strictly fewer files than the snapshot holds; the
    // aggregate restates the 2-D box from raw orders — a wrongly pruned
    // file loses rows and goes hash-red.
    "q146_logtable_zorder" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q146")
      val base = ordersShaped(s, dir, withOdate = true)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      try {
        // enough files that the z-blocks subdivide each year partition
        s.conf.set("spark.sql.shuffle.partitions", "64")
        graft.sources.LogTable.create(s, t, base, Seq("o_year"),
          Seq("odate", "cents"), zorderBy = Seq("odate", "cents"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      val total = graft.sources.LogTable.snapshot(s, t).files.length
      def kept(p: org.apache.spark.sql.Column): Int =
        graft.sources.LogTable.readWhere(s, t, p).inputFiles.length
      val dateWindow = col("odate").between("1997-04-01", "1997-06-30")
      val centsBand = col("cents") >= 30000000L
      val ok = kept(dateWindow) < total && kept(centsBand) < total
      graft.sources.LogTable.readWhere(s, t, dateWindow && centsBand)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("zorder_ok", lit(ok))
    }),

    // INCREMENTAL MATERIALIZED VIEW — the 100 TB answer to "keep this
    // rollup fresh": define count/count(col)/sum/avg over the base log
    // table once, then each refresh folds ONLY the files changed since
    // the watermark (signed-delta IVM) into a bucketed state table. The
    // change window touches one year, so the second refresh rewrites
    // only the buckets holding 1997 groups (spared>0 pinned); the same
    // window re-refreshed returns -1 (exactly-once watermark). The
    // oracle recomputes the final aggregate from scratch in DuckDB —
    // a drifted delta, a double-applied window, a mishandled NULL
    // input, or a stale group all hash-red.
    "q147_materialized_view" -> ((s, dir) => {
      import graft.sources.{LogTable, MaterializedView => MV}
      val t = scratch(s, dir, "graft_q147")
      val mv = scratch(s, dir, "graft_q147mv")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        lit(0).as("version"), lit("U").as("op"))
        .withColumn("bonus", when(col("cents") % 3 === 0, col("cents")))
      LogTable.create(s, t, base, Seq("o_year"), Seq("k", "o_month"))
      // 252 (year, month, status) groups over 32 buckets: enough group
      // cardinality that the salt-ranged writer lays state files out
      // bucket-pure, so the sparing pin below measures real pruning
      MV.define(s, mv, t, Seq("o_year", "o_month", "status"), Seq(
        MV.MvCount("n"), MV.MvCountCol("n_bonus", "bonus"),
        MV.MvSum("sum_cents", "cents"), MV.MvAvg("avg_bonus", "bonus")),
        nBuckets = 32): Unit
      MV.refresh(s, mv): Unit
      // the change window touches ONE month -> 3 groups -> <=3 buckets
      val touched = col("o_year") === 1997 && col("o_month") === 6
      val upd = base.filter(col("k") % 7 === 0 && touched)
        .withColumn("cents", expr("(cents * 110) div 100"))
        .withColumn("bonus", when(col("cents") % 3 === 0, col("cents")))
        .withColumn("version", lit(1))
      val del = base.filter(col("k") % 13 === 0 && touched)
        .withColumn("version", lit(2)).withColumn("op", lit("D"))
      val delta = upd.unionByName(del)
      val deltaRows = delta.count()
      LogTable.upsert(s, t, delta, Seq("k"), Seq("version"), "op"): Unit
      val before = LogTable.snapshot(s, mv)
      MV.refresh(s, mv): Unit
      val afterNames = LogTable.snapshot(s, mv).files.map(_.name).toSet
      val spared = before.files.count(f => afterNames.contains(f.name))
      // the bucket-sparing pin only discriminates when the window
      // actually changed rows (a tiny scale factor can leave the
      // 1997-06 window empty — then sparing everything IS correct)
      val sparingOk = deltaRows == 0L ||
        (spared > 0 && spared < before.files.size)
      val ok = sparingOk &&
        MV.refresh(s, mv) == -1L &&
        MV.refreshedVersion(s, mv) == LogTable.latestVersion(s, t)
      MV.read(s, mv)
        .withColumn("avg_bonus", round(col("avg_bonus"), 4))
        .withColumn("mv_ok", lit(ok))
    }),

    // MV MIN/MAX — the non-retractable aggregates under the rescan
    // discipline: the initial load folds extremes in place; deleting the
    // CURRENT MINIMUM row of every 1997 group forces the per-group
    // rescan (the fold cannot know the runner-up), and a pure-insert
    // window of new global maxima folds without touching the base. The
    // oracle recomputes min/max/count/sum from scratch over the final
    // state — a stale extremum after the targeted delete hash-reds
    // immediately.
    "q149_mv_minmax" -> ((s, dir) => {
      import graft.sources.{LogTable, MaterializedView => MV}
      import org.apache.spark.sql.expressions.Window
      val t = scratch(s, dir, "graft_q149")
      val mv = scratch(s, dir, "graft_q149mv")
      val base = ordersShaped(s, dir, withOdate = false)
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"))
      MV.define(s, mv, t, Seq("o_year", "status"), Seq(
        MV.MvCount("n"), MV.MvMin("min_cents", "cents"),
        MV.MvMax("max_cents", "cents"), MV.MvSum("sum_cents", "cents")),
        nBuckets = 16): Unit
      MV.refresh(s, mv): Unit
      // delete exactly each 1997 group's minimum-cents row (ties broken
      // by key — mirrored in the oracle) → the rescan must repair min
      val w = Window.partitionBy("o_year", "status")
        .orderBy(col("cents"), col("k"))
      val delMin = LogTable.read(s, t).filter(col("o_year") === 1997)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .drop("rn").withColumn("version", lit(1)).withColumn("op", lit("D"))
      LogTable.upsert(s, t, delMin, Seq("k"), Seq("version"), "op"): Unit
      MV.refresh(s, mv): Unit
      // pure-insert window: new 1998 maxima fold via greatest(), no rescan
      val insMax = base.filter(col("o_year") === 1998 && col("k") % 97 === 0)
        .withColumn("k", col("k") + 30000000L)
        .withColumn("cents", col("cents") + 1000000000L)
        .withColumn("version", lit(1))
      LogTable.upsert(s, t, insMax, Seq("k"), Seq("version"), "op"): Unit
      MV.refresh(s, mv): Unit
      val ok = MV.refresh(s, mv) == -1L &&
        MV.refreshedVersion(s, mv) == LogTable.latestVersion(s, t)
      MV.read(s, mv).withColumnRenamed("status", "o_orderstatus")
        .withColumn("mv_ok", lit(ok))
    }),

    // SYNC-FROM-SNAPSHOT MERGE — WHEN NOT MATCHED BY SOURCE through the
    // SQL front door: ONE statement upserts the desired 1997 snapshot
    // (update matched, insert new) AND deletes departed 1997 rows, the
    // classic dimension-table refresh that previously needed a second
    // anti-join delete transaction. The by-source condition scopes the
    // expiry to t.o_year = 1997, so every other year rides through
    // untouched; sync_ok pins one MERGE_INTO transaction and zero
    // departed survivors.
    "q150_merge_by_source" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q150")
      val base = ordersShaped(s, dir, withOdate = false)
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"))
      val y97 = base.filter(col("o_year") === 1997)
      // the desired snapshot: k%13 departed, k%7 repriced, k%11 cloned new
      y97.filter(col("k") % 13 =!= 0)
        .withColumn("cents", when(col("k") % 7 === 0,
          expr("(cents * 110) div 100")).otherwise(col("cents")))
        .select("k", "status", "cents", "o_year")
        .unionByName(y97.filter(col("k") % 11 === 0)
          .select((col("k") + 10000000L).as("k"), col("status"),
            (col("cents") + 7L).as("cents"), col("o_year")))
        .createOrReplaceTempView("q150_src")
      s.sql(
        s"""MERGE INTO graft.`$t` t USING q150_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET cents = s.cents, version = 1
           |WHEN NOT MATCHED THEN INSERT (k, status, cents, o_year, version, op)
           |  VALUES (s.k, s.status, s.cents, s.o_year, 1, 'U')
           |WHEN NOT MATCHED BY SOURCE AND t.o_year = 1997 THEN DELETE
           |""".stripMargin): Unit
      val departed = LogTable.read(s, t)
        .filter(col("o_year") === 1997 && col("k") % 13 === 0 &&
          col("k") < 10000000L).count()
      val ops = LogTable.history(s, t).groupBy("operation").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ok = departed == 0L && ops.get("MERGE_INTO").contains(1L) &&
        LogTable.snapshot(s, t).version == 2L
      LogTable.read(s, t)
        .groupBy(col("o_year"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("sync_ok", lit(ok))
    }),

    // MATERIALIZED VIEW THROUGH SQL — the whole IVM lifecycle as
    // statements: CREATE MATERIALIZED VIEW ... AS SELECT (the defining
    // query is real SQL, analyzed and pattern-matched into the
    // incremental definition — min/max included), base DML through SQL
    // DELETE/UPDATE (the delete takes group minima with it, forcing the
    // rescan), REFRESH MATERIALIZED VIEW, and the graft_mv() read TVF.
    // The oracle recomputes the view from the restated final base state.
    "q154_mv_sql" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q154")
      val mv = scratch(s, dir, "graft_q154mv")
      val base = ordersShaped(s, dir, withOdate = false)
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"))
      s.sql(s"CREATE MATERIALIZED VIEW graft.`$mv` BUCKETS 16 AS " +
        s"SELECT o_year, status, count(*) AS n, sum(cents) AS sum_cents, " +
        s"min(cents) AS min_cents, max(cents) AS max_cents " +
        s"FROM graft.`$t` GROUP BY o_year, status"): Unit
      s.sql(s"DELETE FROM graft.`$t` WHERE o_year = 1997 AND k % 13 = 0"): Unit
      s.sql(s"UPDATE graft.`$t` SET cents = (cents * 110) div 100, " +
        "version = 1 WHERE o_year = 1997 AND k % 7 = 0"): Unit
      val rv = s.sql(s"REFRESH MATERIALIZED VIEW graft.`$mv`")
        .head().getLong(0)
      val ok = rv > 0L &&
        s.sql(s"REFRESH MATERIALIZED VIEW graft.`$mv`")
          .head().getLong(0) == -1L
      s.sql(s"SELECT * FROM graft_mv('$mv')")
        .withColumnRenamed("status", "o_orderstatus")
        .withColumn("mv_sql_ok", lit(ok))
    }),

    // TYPE-WIDENING EVOLUTION — the day a 32-bit counter overflows: the
    // table is created with INT cents, and a repricing batch carrying
    // values past Int.MaxValue widens the column to LONG in ONE merge
    // (mergeSchema — rejected loud without it). Metadata-only: untouched
    // int-era files survive by name under the widened read schema (the
    // vectorized reader serves narrow physical pages as long), and their
    // int-era min/max stats still prune a >10B predicate down to the new
    // files alone. The oracle recomputes the final state with the widened
    // arithmetic — an overflow, a dropped file, or a mis-cast hash-reds.
    "q153_type_widening" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q153")
      val base = ordersShaped(s, dir, withOdate = false)
        .withColumn("cents", col("cents").cast("int"))
      LogTable.create(s, t, base, Seq("o_year"), Seq("cents"))
      val before = LogTable.snapshot(s, t)
      val upd = base.filter(col("o_year") === 1997 && col("k") % 7 === 0)
        .withColumn("cents", col("cents").cast("long") + 10000000000L)
        .withColumn("version", lit(1))
      val caught =
        try {
          LogTable.upsert(s, t, upd, Seq("k"), Seq("version"), "op")
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("widens") }
      LogTable.upsert(s, t, upd, Seq("k"), Seq("version"), "op",
        mergeSchema = true): Unit
      val after = LogTable.snapshot(s, t)
      val spared = before.files.map(_.name).toSet
        .intersect(after.files.map(_.name).toSet)
      val pruned = LogTable.readWhere(s, t, col("cents") >= 10000000000L)
        .inputFiles.length
      val ok = caught &&
        after.schema("cents").dataType ==
          org.apache.spark.sql.types.LongType &&
        spared.nonEmpty && pruned < after.files.length
      LogTable.read(s, t)
        .groupBy(col("o_year"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("widen_ok", lit(ok))
    }),

    // SQL LIFECYCLE — the maintenance dialect through the delegating
    // parser (the statements Spark's grammar lacks): ALTER TABLE ADD
    // CONSTRAINT enforces on a violating SQL INSERT, OPTIMIZE compacts
    // under the persisted layout, VACUUM respects the retention floor
    // (loud) and prunes dead files under FORCE, DESCRIBE HISTORY reads
    // the ledger, DROP CONSTRAINT clears — all landing on the SAME
    // maintenance entry points as the programmatic API. The oracle
    // restates the one row-visible change (the UPDATE); everything else
    // must be row-invisible, so a compaction or vacuum that altered
    // rows hash-reds.
    // NAMED TABLES — the DSv2 TableCatalog gate: the full lifecycle
    // (CREATE NAMESPACE, CTAS, DELETE/UPDATE/MERGE/INSERT, VERSION AS
    // OF, DESCRIBE HISTORY/DETAIL, ALTER evolution) through
    // `glake.db.orders` NAMES, resolving through the SAME
    // snapshot/FileIndex plan as the `graft.`path`` form — named_ok
    // pins plan identity (LogTableFileIndex behind the name),
    // name/path parity, time travel, the history ledger and the
    // metadata-only evolution; the oracle restates the DML chain.
    "q155_named_catalog" -> ((s, dir) => {
      import graft.sources.{GraftCatalog, LogTable}
      val root = scratch(s, dir, "graft_q155")
      // one catalog NAME per dataset dir: CatalogManager caches the
      // plugin instance at first use, so a shared name registered during
      // a warm-up pass at another sf would keep ITS root forever
      val cat = "glake_" + new java.io.File(dir).getName.replace('.', '_')
      s.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val base = ordersShaped(s, dir, withOdate = false)
      base.createOrReplaceTempView("q155_base")
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db"): Unit
      s.sql(s"CREATE TABLE $cat.db.orders PARTITIONED BY (o_year) " +
        "STATS BY (k) AS SELECT * FROM q155_base"): Unit
      s.sql(s"DELETE FROM $cat.db.orders " +
        "WHERE o_year = 1996 AND k % 5 = 0"): Unit
      s.sql(s"UPDATE $cat.db.orders SET cents = (cents * 110) div 100, " +
        "version = 1 WHERE o_year = 1997 AND k % 7 = 0"): Unit
      val y98 = base.filter(col("o_year") === 1998)
      y98.filter(col("k") % 7 === 0 || col("k") % 13 === 0)
        .withColumn("act", when(col("k") % 13 === 0, "D").otherwise("U"))
        .withColumn("newcents", col("cents") + 1111)
        .select("k", "status", "newcents", "o_year", "act")
        .unionByName(y98.filter(col("k") % 11 === 0)
          .select((col("k") + 10000000L).as("k"), col("status"),
            (col("cents") + 5).as("newcents"), col("o_year"),
            lit("I").as("act")))
        .createOrReplaceTempView("q155_src")
      s.sql(
        s"""MERGE INTO $cat.db.orders t USING q155_src s ON t.k = s.k
          |WHEN MATCHED AND s.act = 'D' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET cents = s.newcents, version = 2
          |WHEN NOT MATCHED THEN INSERT (k, status, cents, o_year, version, op)
          |  VALUES (s.k, s.status, s.newcents, s.o_year, 3, 'U')
          |""".stripMargin): Unit
      s.sql(s"INSERT INTO $cat.db.orders " +
        "SELECT k + 20000000, status, cents * 2, o_year, 4, 'U' " +
        "FROM q155_base WHERE o_year = 1999 AND k % 50 = 0"): Unit
      // time travel by NAME sees the CTAS state; name/path parity holds
      val v1 = s.sql(
        s"SELECT count(*) AS n FROM $cat.db.orders VERSION AS OF 1")
        .head().getLong(0)
      val tablePath = s"$root/db/orders"
      val byPath = LogTable.read(s, tablePath).count()
      val byName = s.table(s"$cat.db.orders").count()
      // the scan behind the name IS the log-table FileIndex plan
      val planOk = s.table(s"$cat.db.orders").queryExecution.analyzed
        .collectFirst {
          case org.apache.spark.sql.execution.datasources.LogicalRelation(
              fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
              _, _, _, _)
              if fs.location.isInstanceOf[
                graft.sources.LogTableFileIndex] => ()
        }.isDefined
      val ops = s.sql(s"DESCRIBE HISTORY $cat.db.orders")
        .groupBy("operation").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val detailOk = s.sql(s"DESCRIBE DETAIL $cat.db.orders")
        .head().getAs[String]("partition_columns") == "o_year"
      // schema evolution by name: append a column, widen a type —
      // metadata-only (zero files touched), old rows NULL-fill
      val filesBefore = LogTable.snapshot(s, tablePath).files.map(_.name)
      s.sql(s"ALTER TABLE $cat.db.orders ADD COLUMNS (note STRING)"): Unit
      s.sql(s"ALTER TABLE $cat.db.orders " +
        "ALTER COLUMN version TYPE BIGINT"): Unit
      val schema = s.table(s"$cat.db.orders").schema
      val evolveOk =
        schema.fieldNames.contains("note") &&
        schema("version").dataType ==
          org.apache.spark.sql.types.LongType &&
        LogTable.snapshot(s, tablePath).files.map(_.name) == filesBefore &&
        s.table(s"$cat.db.orders")
          .filter(col("note").isNotNull).count() == 0L
      val ok = v1 == base.count() && byPath == byName && planOk &&
        detailOk && evolveOk &&
        Seq("CREATE", "MERGE_INTO").forall(ops.contains)
      s.sql(s"SELECT o_year, status AS o_orderstatus, count(*) AS n, " +
        "sum(cents) AS sum_cents, sum(version) AS sum_version " +
        s"FROM $cat.db.orders GROUP BY o_year, status")
        .withColumn("named_ok", lit(ok))
    }),

    // GENERATED PARTITION COLUMNS — `PARTITIONED BY (year(odate))` at
    // CREATE derives `odate_year`, materialized on every write (the
    // INSERT below omits it) and PRUNED THROUGH on predicates that
    // bound only the SOURCE column: gen_ok pins the persisted
    // declaration, metadata exclusion of files from an odate-only
    // bound (countWhere.excludedFiles > 0 — no derived column in the
    // user's predicate), and the recompute on ingest.
    "q156_generated_partitions" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q156")
      val base = ordersShaped(s, dir, withOdate = true)
      base.createOrReplaceTempView("q156_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (year(odate)) " +
        "STATS BY (k) AS SELECT k, status, cents, odate, version, op " +
        "FROM q156_base"): Unit
      val snap = LogTable.snapshot(s, t)
      // a bound on odate ALONE excludes files by the derived column
      val cw = LogTable.countWhere(s, t,
        expr("odate < TIMESTAMP_NTZ'1995-01-01 00:00:00'"))
      val want = base
        .filter(expr("odate < TIMESTAMP_NTZ'1995-01-01 00:00:00'")).count()
      // ingest WITHOUT the derived column — recomputed on write
      s.sql(s"INSERT INTO graft.`$t` BY NAME " +
        "SELECT k + 30000000 AS k, status, cents, odate, version, op " +
        "FROM q156_base WHERE o_year = 1992 AND k % 97 = 0"): Unit
      val driftFree = s.sql(s"SELECT count(*) AS n FROM graft.`$t` " +
        "WHERE odate_year <> year(odate)").head().getLong(0) == 0L
      val ok = snap.partitionCols == Seq("odate_year") &&
        snap.properties.get("gen.odate_year").contains("year(odate)") &&
        cw.count == want && cw.excludedFiles > 0 && driftFree
      s.sql(s"SELECT odate_year, count(*) AS n, " +
        s"sum(cents) AS sum_cents FROM graft.`$t` GROUP BY odate_year")
        .withColumn("odate_year", col("odate_year").cast("int"))
        .withColumn("gen_ok", lit(ok))
    }),

    // IDENTITY COLUMNS — `identity.col = id`: append batches OMITTING
    // the column fill generated values, unique and strictly above every
    // previously committed value; the high-water rides the commit
    // properties off the stats the write already records. Generated
    // values are non-deterministic (gaps allowed), so the gate pins
    // uniqueness and ordering as FLAGS and hashes the deterministic
    // content (counts/sums per segment) against the oracle.
    "q176_identity" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q176")
      val base = Tables(s, dir, "customer").select(
        col("c_custkey").cast("long").as("id"),
        col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"),
        lit("base").as("src"))
      LogTable.create(s, t, base, Seq("segment"), statsCols = Seq("id"),
        tableProperties = Map(LogTable.IdentityColProp -> "id")): Unit
      val maxBase = base.agg(max("id")).head().getLong(0)
      base.filter(col("id") % 13 === 0)
        .select(col("segment"), (col("cents") + 5L).as("cents"),
          lit("w1").as("src"))
        .createOrReplaceTempView("q176_w1")
      LogTable.append(s, t, s.table("q176_w1")): Unit
      LogTable.append(s, t,
        base.filter(col("id") % 17 === 0)
          .select(col("segment"), (col("cents") + 7L).as("cents"),
            lit("w2").as("src"))): Unit
      val all = LogTable.read(s, t)
      val uniqueOk = all.select("id").distinct().count() == all.count()
      val w1Min = all.filter(col("src") === "w1")
        .agg(min("id")).head().getLong(0)
      val w1Max = all.filter(col("src") === "w1")
        .agg(max("id")).head().getLong(0)
      val w2Min = all.filter(col("src") === "w2")
        .agg(min("id")).head().getLong(0)
      // generated values clear the seed AND each earlier wave
      val orderedOk = w1Min > maxBase && w2Min > w1Max
      val idOk = uniqueOk && orderedOk
      all.groupBy(col("segment"), col("src"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("id_ok", lit(idOk))
    }),

    // WRITE-AUDIT-PUBLISH (branch refs) — stage a batch of DML on a
    // BRANCH (a clone under _branches/<name> recording its fork
    // version), audit the staged state with ops/Validate, and publish
    // as ONE fast-forward metadata commit. The gate pins: main
    // BYTE-UNCHANGED while staged (version + content), the audit
    // actually gating (a poisoned branch fails enforce and is dropped
    // with zero main impact), the published read carrying exactly the
    // staged state, non-fast-forward publish refusing loud after main
    // advanced, and a TAG riding the pre-publish version for reads.
    // NULL PARTITION VALUES — first-class end to end (the Delta/Iceberg
    // null-partition shape): a table PARTITIONED on a nullable column
    // writes NULL tuples, IS NULL pruning finds exactly the null-holding
    // files, non-NULL predicates exclude all-NULL files without reading
    // them, predicate DML and the latest-wins upsert target the NULL
    // partition, and the row-level CDC feed serves the changes — volume
    // proportional to the batch, never the partition.
    // ROW TRACKING — stable row identity (the Delta row-tracking
    // shape): `_row_id` dense-assigns at create, SURVIVES a predicate
    // UPDATE and a compaction bit-identically (pinned by an anti-join
    // count), upserts inherit matched keys' ids and mint fresh ones,
    // and the change feed folds KEYLESS — readNetChanges(keyCols=Nil)
    // reconstructs the head state from the v1 snapshot by _row_id
    // alone, exceptAll-pinned in both directions.
    "q184_row_tracking" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q184")
      val base = ordersShaped(s, dir, withOdate = false)
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"),
        tableProperties = Map(LogTable.RowTrackingProp -> "true")) // v1
      s.sql(s"UPDATE graft.`$t` SET cents = cents + 3 " +
        "WHERE k % 9 = 0"): Unit                                   // v2
      LogTable.compactPartitions(s, t, maxFilesPerPartition = 2): Unit
      // rewrites must never re-key a row
      val pre = LogTable.read(s, t, asOf = Some(1L))
        .select(col("k"), col("_row_id").as("rid0"))
      val stable = pre.join(
          LogTable.read(s, t).select(col("k"), col("_row_id")), "k")
        .filter(col("rid0") =!= col("_row_id")).count() == 0L
      // upsert: matched keys inherit, new keys mint fresh
      val updBatch = base.filter(col("k") % 11 === 0)
        .select(col("k"), col("status"), (col("cents") + 1L).as("cents"),
          col("o_year"), lit(9).as("version"), col("op"))
      val insBatch = updBatch
        .withColumn("k", col("k") + 90000000L)
      LogTable.upsert(s, t, updBatch.unionByName(insBatch),
        Seq("k"), Seq("version"), "op"): Unit
      val cur = LogTable.read(s, t)
      val inherited = pre.join(cur.filter(col("k") % 11 === 0 &&
          col("k") < 90000000L).select(col("k"), col("_row_id")), "k")
        .filter(col("rid0") =!= col("_row_id")).count() == 0L
      val maxPre = pre.agg(max(col("rid0"))).head().getLong(0)
      val freshOk = cur.filter(col("k") >= 90000000L)
        .agg(min(col("_row_id")), count(lit(1)),
          countDistinct(col("_row_id"))).head() match {
        case r => r.getLong(0) > maxPre && r.getLong(1) == r.getLong(2)
      }
      // KEYLESS net fold: v1 + changes-by-_row_id == head, exactly
      val head = LogTable.latestVersion(s, t)
      val net = LogTable.readNetChanges(s, t, 1L, head, Nil)
      val preRows = LogTable.read(s, t, asOf = Some(1L))
        .select("_row_id", "k", "status", "cents", "o_year", "version")
      val gone = net.filter(col("_change_type").isin(
        "delete", "update_preimage")).select("_row_id")
      val arrived = net.filter(col("_change_type").isin(
        "insert", "update_postimage"))
        .select("_row_id", "k", "status", "cents", "o_year", "version")
      val rebuilt = preRows.join(gone, Seq("_row_id"), "left_anti")
        .unionByName(arrived)
      val nowRows = cur
        .select("_row_id", "k", "status", "cents", "o_year", "version")
      val foldOk = multisetEqual(rebuilt, nowRows)
      val ok = stable && inherited && freshOk && foldOk
      cur.groupBy(col("o_year"), col("status"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("row_track_ok", lit(ok))
    }),

    // MAP-OF-STRUCTS nested evolution — the `value` path segment (the
    // DSv2 convention, the map analog of q179's `element`): rename /
    // add inside `map<string,struct<…>>` are METADATA-ONLY (file-list
    // equality pinned), reads rebuild values with transform_values
    // (UDF-free, codegen-friendly), old files NULL-fill the added
    // field, and time travel serves the pre-evolution value shape.
    "q183_map_struct_evolution" -> ((s, dir) => {
      import graft.sources.LogTable
      import org.apache.spark.sql.connector.catalog.TableChange
      val t = scratch(s, dir, "graft_q183")
      val base = ordersShaped(s, dir, withOdate = false)
      val df = base.select(col("k"), col("o_year"),
        map(lit("m"), struct(col("status").as("tag"),
          col("cents").as("score"))).as("props"))
      LogTable.create(s, t, df, Seq("o_year"), Seq("k"))       // v1
      val filesPre = LogTable.snapshot(s, t).files.map(_.name).toSet
      LogTable.evolveSchema(s, t, Seq(TableChange.renameColumn(
        Array("props", "value", "tag"), "label"))): Unit       // v2
      LogTable.evolveSchema(s, t, Seq(TableChange.addColumn(
        Array("props", "value", "note"),
        org.apache.spark.sql.types.StringType, true))): Unit   // v3
      val metaOnly =
        LogTable.snapshot(s, t).files.map(_.name).toSet == filesPre
      // a NEW-shape append rides the evolved schema
      import s.implicits._
      LogTable.append(s, t, Seq((90000001L, 1999))
        .toDF("k", "o_year")
        .select(col("k"), col("o_year"),
          map(lit("m"), struct(lit("Z").as("label"),
            lit(5L).as("score"), lit("y").as("note"))).as("props"))): Unit
      // time travel reads the OLD value shape off the same files
      val ttOk = LogTable.read(s, t, asOf = Some(1L))
        .select(explode(col("props")).as(Seq("mk", "mv")))
        .schema.fields.find(_.name == "mv").get.dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq == Seq("tag", "score")
      val ok = metaOnly && ttOk
      LogTable.read(s, t)
        .select(col("o_year"), explode(col("props")).as(Seq("mk", "mv")))
        .groupBy(col("o_year"), col("mv.label").as("label"))
        .agg(count(lit(1)).as("n"), sum(col("mv.score")).as("sum_score"),
          count(col("mv.note")).as("n_note"))
        .withColumn("map_evo_ok", lit(ok))
    }),

    "q182_null_partitions" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q182")
      // a REAL null population: 'O' orders carry NULL seg (~ a third)
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        nullif(col("o_orderstatus"), lit("O")).as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        lit(0L).as("version"), lit("U").as("op"))
      LogTable.create(s, t, base, Seq("seg"), Seq("k"),
        tableProperties = Map(LogTable.CdcProp -> "true"))         // v1
      s.sql(s"UPDATE graft.`$t` SET cents = cents + 7, version = 1 " +
        "WHERE seg IS NULL AND k % 5 = 0"): Unit                   // v2
      s.sql(s"DELETE FROM graft.`$t` WHERE seg = 'F' AND k % 7 = 0"): Unit // v3
      // latest-wins upsert INTO the null partition: updates off the
      // PRE-DML base values (version 9 wins) plus brand-new keys
      val updBatch = base.filter(col("seg").isNull && col("k") % 11 === 0)
        .select(col("k"), col("seg"), (col("cents") + 1L).as("cents"),
          col("o_year"), lit(9L).as("version"), col("op"))
      val insBatch = updBatch.select((col("k") + 90000000L).as("k"),
        col("seg"), col("cents"), col("o_year"), col("version"), col("op"))
      val v4 = LogTable.upsert(s, t, updBatch.unionByName(insBatch),
        Seq("k"), Seq("version"), "op")
      // pruning proofs off the log alone: IS NULL excludes provably
      // null-free files; equality excludes every all-NULL file
      val snap = LogTable.snapshot(s, t)
      val nullOnly = snap.files.count(f => f.stats.exists { case (c, st) =>
        c.equalsIgnoreCase("seg") && st.min.isEmpty && st.nulls > 0 })
      val cwNull = LogTable.countWhere(s, t, col("seg").isNull)
      val cwEq = LogTable.countWhere(s, t, col("seg") === "F")
      val pruneOk = nullOnly >= 1 && cwNull.excludedFiles >= 1 &&
        cwEq.scannedFiles + cwEq.decidedFiles <= snap.files.size - nullOnly
      // the row-level feed over the upsert commit: exactly the batch
      val nUpd = updBatch.count()
      val feed = LogTable.readCommitChanges(s, t, v4 - 1, v4)
        .groupBy(col("_change_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val feedOk = feed.getOrElse("insert", 0L) == nUpd &&
        feed.getOrElse("update_preimage", 0L) == nUpd &&
        feed.getOrElse("update_postimage", 0L) == nUpd &&
        feed.getOrElse("delete", 0L) == 0L
      val ok = pruneOk && feedOk && v4 == 4L &&
        cwNull.count == LogTable.read(s, t).filter(col("seg").isNull).count()
      LogTable.read(s, t)
        .groupBy(coalesce(col("seg"), lit("(null)")).as("seg_g"),
          col("o_year"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("null_part_ok", lit(ok))
    }),

    "q181_wap_branch" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q181")
      val base = Tables(s, dir, "customer").select(
        col("c_custkey").cast("long").as("k"),
        col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      LogTable.create(s, t, base, Seq("segment"), statsCols = Seq("k"))
      val v0 = LogTable.snapshot(s, t).version
      LogTable.tag(s, t, "pre-wap"): Unit
      val bp = LogTable.createBranch(s, t, "wap")
      // stage on the branch: bump + delete + insert
      LogTable.updateWhere(s, bp, col("k") % 10 === 0,
        Map("cents" -> (col("cents") + 5L))): Unit
      LogTable.deleteWhere(s, bp, col("k") % 17 === 0): Unit
      import s.implicits._
      LogTable.append(s, bp, Seq((9000001L, "WAP", 777L))
        .toDF("k", "segment", "cents")): Unit
      // audit gate: the staged state must pass before any publish
      graft.ops.Validate.enforce(LogTable.read(s, bp), Seq(
        graft.ops.Validate.unique("k"),
        graft.ops.Validate.notNull("segment")))
      // main pinned UNCHANGED while staged
      val mainN = LogTable.read(s, t).count()
      val stagedOk = LogTable.snapshot(s, t).version == v0 &&
        mainN == base.count() &&
        LogTable.read(s, t).filter(col("k") === 9000001L).count() == 0L
      val pv = LogTable.publishBranch(s, t, "wap")
      val ffOk = pv == v0 + 1
      // a poisoned second branch: audit fails, branch drops, main clean
      val bp2 = LogTable.createBranch(s, t, "bad")
      LogTable.append(s, bp2, Seq((1L, "POISON", 1L))
        .toDF("k", "segment", "cents")): Unit // duplicate key 1
      val auditOk =
        try { graft.ops.Validate.enforce(LogTable.read(s, bp2), Seq(
          graft.ops.Validate.unique("k"))); false }
        catch { case _: IllegalStateException => true }
      LogTable.dropBranch(s, t, "bad")
      // non-FF with DISJOINT work REBASES: a branch staged before a
      // main advance still publishes when the interim commits touched
      // other files (the Iceberg cherry-pick shape) — main's mid-stage
      // append survives alongside the branch's
      val bp3 = LogTable.createBranch(s, t, "late")
      LogTable.append(s, bp3, Seq((9000003L, "LATE", 1L))
        .toDF("k", "segment", "cents")): Unit
      LogTable.append(s, t, Seq((9000004L, "MAIN", 2L))
        .toDF("k", "segment", "cents")): Unit
      val vMid = LogTable.snapshot(s, t).version
      val rebaseOk = LogTable.publishBranch(s, t, "late") == vMid + 1 &&
        LogTable.read(s, t).filter(col("k") === 9000003L).count() == 1L &&
        LogTable.read(s, t).filter(col("k") === 9000004L).count() == 1L
      LogTable.dropBranch(s, t, "late")
      // non-FF with OVERLAPPING work refuses: both sides rewrote the
      // same files — re-basing would lose one side's rows
      val bp4 = LogTable.createBranch(s, t, "clash")
      LogTable.updateWhere(s, bp4, col("k") % 10 === 0,
        Map("cents" -> (col("cents") + 1L))): Unit
      LogTable.updateWhere(s, t, col("k") % 10 === 0,
        Map("cents" -> (col("cents") + 2L))): Unit
      val nonFfOk =
        try { LogTable.publishBranch(s, t, "clash"); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("fast-forward") }
      LogTable.dropBranch(s, t, "clash")
      // the tag still reads the pre-WAP state
      val tagOk = LogTable.readTag(s, t, "pre-wap").count() == mainN
      val _ = bp
      val wapOk = stagedOk && ffOk && auditOk && rebaseOk && nonFfOk && tagOk
      LogTable.read(s, t).groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("wap_ok", lit(wapOk))
    }),

    // CONVERT — in-place adoption of an existing hive-partitioned
    // parquet directory (the `CONVERT TO DELTA` shape): one metadata
    // pass + one column-pruned stats scan, ZERO rewrites (pinned by
    // file-list equality against the raw directory listing). After
    // adoption the directory IS a log table: reads fill partition
    // values from the directory names (pinned equal to the raw parquet
    // read), predicate DELETE and APPEND work, and time travel to the
    // adopted version still reproduces the original directory.
    "q180_convert_adopt" -> ((s, dir) => {
      import graft.sources.{LogTable, Sources}
      val t = scratch(s, dir, "graft_q180")
      val raw = t + "/adopted"
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"))
      Sources.writeParquet(base, raw, partitionBy = Seq("status"))
      val fsys = new org.apache.hadoop.fs.Path(raw)
        .getFileSystem(s.sessionState.newHadoopConf())
      def listParquet(d: org.apache.hadoop.fs.Path): Seq[String] =
        fsys.listStatus(d).toSeq.flatMap { st =>
          if (st.isDirectory && !st.getPath.getName.startsWith("_"))
            listParquet(st.getPath)
          else if (st.isFile && st.getPath.getName.endsWith(".parquet"))
            Seq(st.getPath.getName)
          else Nil
        }
      val preFiles = listParquet(new org.apache.hadoop.fs.Path(raw)).sorted
      val rawRead = s.read.parquet(raw)
        .select(col("k"), col("cents"), col("o_year"),
          col("status").cast("string").as("status"))
      LogTable.convert(s, raw, statsCols = Seq("k")): Unit
      val snap = LogTable.snapshot(s, raw)
      val adoptOk = snap.version == 1L &&
        snap.files.map(f => new org.apache.hadoop.fs.Path(f.name).getName)
          .sorted == preFiles &&
        snap.partitionCols == Seq("status")
      // adopted read ≡ raw parquet read, both directions
      val adopted = LogTable.read(s, raw)
        .select(col("k"), col("cents"), col("o_year"), col("status"))
      val eqOk = multisetEqual(adopted, rawRead)
      // DML on the adopted table
      LogTable.deleteWhere(s, raw, col("k") % 97 === 0): Unit
      import s.implicits._
      LogTable.append(s, raw, Seq((9000001L, "X", 123L, 1998))
        .toDF("k", "status", "cents", "o_year")): Unit
      // time travel to the adopted version reproduces the original
      val atV1 = LogTable.read(s, raw, asOf = Some(1L))
        .select(col("k"), col("cents"), col("o_year"), col("status"))
      val ttOk = atV1.exceptAll(rawRead).limit(1).count() == 0L
      // MIGRATE the hive debt (one dataChange=false commit: values bake
      // into the data, every live file flat) — deletion vectors unlock
      LogTable.migrateConverted(s, raw): Unit
      val postMig = LogTable.snapshot(s, raw)
      val migOk =
        !postMig.properties.contains(LogTable.ConvertHiveProp) &&
        postMig.files.forall(f => !f.name.contains("/"))
      LogTable.deleteWhere(s, raw, col("k") === 42L,
        deletionVectors = true): Unit
      val convertOk = adoptOk && eqOk && ttOk && migOk
      LogTable.read(s, raw).groupBy(col("status"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("convert_ok", lit(convertOk))
    }),

    // IDENTITY DDL SURFACE — the standard-SQL declaration: column-list
    // CREATE carrying `GENERATED BY DEFAULT AS IDENTITY (START WITH s
    // INCREMENT BY i)`, the DENSE fill (a batch of n rows burns exactly
    // n lattice values — never monotonically_increasing_id's 2^33 per
    // partition), supplied values pushing the high-water to the next
    // lattice point, and `ALTER COLUMN ... SYNC IDENTITY` as a no-op on
    // an aligned table. Exact generated-value SETS are pinned Spark-side
    // (w1 = 1000,1010,…; w2 restarts at the lattice point past the
    // supplied 999999); the hashed output is the per-segment rollup.
    "q178_identity_ddl" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q178")
      s.sql(s"CREATE TABLE graft.`$t` (" +
        "id BIGINT GENERATED BY DEFAULT AS IDENTITY " +
        "(START WITH 1000 INCREMENT BY 10), " +
        "seg STRING, cents BIGINT) " +
        "PARTITIONED BY (seg) STATS BY (id)").collect(): Unit
      val props = LogTable.snapshot(s, t).properties
      val createdOk = props.get(LogTable.IdentityColProp).contains("id") &&
        props.get(LogTable.IdentityStartProp).contains("1000") &&
        props.get(LogTable.IdentityIncProp).contains("10") &&
        s.sql(s"DESCRIBE DETAIL graft.`$t`").collect().nonEmpty
      val cust = Tables(s, dir, "customer").select(
        col("c_custkey").cast("long").as("ck"),
        col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val w1 = cust.filter(col("ck") % 10 === 0)
        .select(col("seg"), (col("cents") + 1L).as("cents"))
      val n1 = w1.count()
      LogTable.append(s, t, w1): Unit
      val ids1 = LogTable.read(s, t).select("id").as(
        org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq
      val w1Ok = ids1 == (0L until n1).map(1000L + 10L * _)
      // a supplied value off past the lattice
      import s.implicits._
      LogTable.append(s, t,
        Seq((999999L, "ZZZ", 42L)).toDF("id", "seg", "cents")): Unit
      val w2 = cust.filter(col("ck") % 15 === 0)
        .select(col("seg"), (col("cents") + 2L).as("cents"))
      val n2 = w2.count()
      LogTable.append(s, t, w2): Unit
      val ids2 = LogTable.read(s, t).select("id").as(
        org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq
      // the lattice point past 999999 from start 1000 step 10 = 1000000
      val w2Ok = ids2 == ((0L until n1).map(1000L + 10L * _) ++
        Seq(999999L) ++ (0L until n2).map(1000000L + 10L * _))
      val syncOk = LogTable.syncIdentity(s, t) == -1L &&
        s.sql(s"ALTER TABLE graft.`$t` ALTER COLUMN id SYNC IDENTITY")
          .collect().head.getLong(0) == -1L
      val idOk = createdOk && w1Ok && w2Ok && syncOk
      LogTable.read(s, t).groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("ddl_ok", lit(idOk))
    }),

    // EQUI-HEIGHT HISTOGRAMS FOR CBO — `hist.cols` columns record 17
    // per-file quantile points in the one-pass stats scan; the snapshot
    // merges them into CatalogColumnStat.histogram. The gate builds a
    // SKEWED fact (most rows on one hot key outside the dim's range)
    // twice — with and without histograms — and pins that the
    // histogram-backed join ESTIMATE lands closer to the true join
    // cardinality than the uniform assumption; the join itself is the
    // hash-matched output.
    "q174_histogram_cbo" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q174")
      // fact: orders keyed by custkey — naturally skewed bottom-coded
      // key: clamp most keys to 1, keep a uniform tail
      val fact = Tables(s, dir, "orders").select(
        col("o_orderkey").as("id"), col("o_orderstatus").as("status"),
        when(col("o_orderkey") % 10 =!= 0, lit(1L))
          .otherwise((col("o_orderkey") % 97) + 2L).as("k"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val dim = Tables(s, dir, "nation").select(
        (col("n_nationkey") + 50L).as("k"), col("n_name").as("name"))
      def mk(sub: String, hist: Boolean): String = {
        val d = t + "/" + sub
        LogTable.create(s, d + "/fact", fact, Seq("status"),
          statsCols = Seq("k"),
          tableProperties =
            if (hist) Map(LogTable.HistColsProp -> "k", "ndv.cols" -> "k")
            else Map("ndv.cols" -> "k")): Unit
        LogTable.create(s, d + "/dim", dim, Nil, statsCols = Seq("k"),
          tableProperties =
            if (hist) Map(LogTable.HistColsProp -> "k", "ndv.cols" -> "k")
            else Map("ndv.cols" -> "k")): Unit
        d
      }
      val dh = mk("hist", hist = true)
      val dp = mk("plain", hist = false)
      val actual = LogTable.table(s, dh + "/fact")
        .join(LogTable.table(s, dh + "/dim"), "k").count()
      // estimate in a CHILD session with CBO pinned on — never toggle
      // the shared session's conf (parallel gates would inherit a race)
      val cboS = s.newSession()
      cboS.conf.set("spark.sql.cbo.enabled", "true")
      // plan stats read the THREAD-ACTIVE session's conf — evaluate
      // under the child session, restored afterwards
      val histOk = org.apache.spark.sql.GraftBridge.withActive(cboS) {
        def est(d: String): BigInt =
          LogTable.table(cboS, d + "/fact")
            .join(LogTable.table(cboS, d + "/dim"), "k")
            .queryExecution.optimizedPlan.stats.rowCount
            .getOrElse(BigInt(-1))
        val (eh, ep) = (est(dh), est(dp))
        eh >= 0 && ep >= 0 &&
          (eh - actual).abs < (ep - actual).abs
      }
      LogTable.table(s, dh + "/fact")
        .join(LogTable.table(s, dh + "/dim"), "k")
        .groupBy(col("name"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("hist_ok", lit(histOk))
    }),

    // AUTO-OPTIMIZE — `optimize.every = n` fires the debt-triggered
    // compaction off every n-th data-change commit (post-publish,
    // best-effort, metadata-only when under budget): a 6-wave ingest
    // loop that would accrete files per partition stays under the
    // declared budget with NO manual OPTIMIZE anywhere, COMPACT commits
    // land dataChange=false, and the final content hashes against the
    // merged-from-scratch oracle.
    "q173_auto_optimize" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q173")
      val base = Tables(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      LogTable.create(s, t, base, Seq("segment"), statsCols = Seq("k"),
        tableProperties = Map(
          LogTable.OptimizeEveryProp -> "2",
          LogTable.OptimizeMaxFilesProp -> "4")): Unit
      (1 to 6).foreach { w =>
        LogTable.append(s, t,
          base.filter(col("k") % 31 === (w % 31).toLong)
            .select((col("k") + w * 10000000L).as("k"), col("segment"),
              (col("cents") + w.toLong).as("cents"))): Unit
      }
      val snap = LogTable.snapshot(s, t)
      val perValue = snap.files.flatMap(f => Set(f.pmin, f.pmax))
        .groupBy(identity).view.mapValues(_.size)
      // budget 4 + at most the last uncompacted wave's spill
      val bounded = perValue.values.forall(_ <= 6)
      val h = LogTable.history(s, t)
        .select("operation", "data_change").collect()
      val compacts = h.filter(_.getString(0) == "COMPACT")
      val fired = compacts.nonEmpty && compacts.forall(!_.getBoolean(1))
      LogTable.read(s, t).groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("ao_ok", lit(bounded && fired))
    }),

    // APPROX-DISTINCT INCREMENTAL MV — `approx_count_distinct` as a
    // maintained aggregate: per-group mergeable HLL sketches union in
    // place on inserts, a delete of a non-NULL input rescans exactly
    // that group (sketches cannot retract). The gate feeds insert and
    // delete windows through SQL refreshes and pins the estimates
    // within tolerance of the exact distinct counts per group
    // (tolerance-pinned, the q166 pattern); counts/sums hash exactly.
    "q172_approx_distinct_mv" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q172")
      val tablePath = t + "/base"
      val mvPath = t + "/mv"
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        col("o_custkey").as("cust"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        lit(0).as("version"), lit("U").as("op"))
      LogTable.create(s, tablePath, base, "o_year"): Unit
      s.sql(s"CREATE MATERIALIZED VIEW graft.`$mvPath` BUCKETS 8 AS " +
        s"SELECT status, count(*) AS n, sum(cents) AS sum_cents, " +
        s"approx_count_distinct(cust) AS adc_cust " +
        s"FROM graft.`$tablePath` GROUP BY status"): Unit
      // an INSERT window (new keys, some repeat customers) then a
      // DELETE window (drops whole customers from one year)
      LogTable.upsert(s, tablePath,
        base.filter(col("k") % 13 === 0)
          .withColumn("k", col("k") + 20000000L)
          .withColumn("version", lit(1)),
        Seq("k"), Seq("version"), "op"): Unit
      s.sql(s"REFRESH MATERIALIZED VIEW graft.`$mvPath`"): Unit
      LogTable.deleteWhere(s, tablePath, col("o_year") === 1995): Unit
      s.sql(s"REFRESH MATERIALIZED VIEW graft.`$mvPath`"): Unit
      val got = graft.sources.MaterializedView.read(s, mvPath)
        .select(col("status"), col("adc_cust"))
      val exact = LogTable.read(s, tablePath).groupBy("status")
        .agg(count_distinct(col("cust")).as("exact_cust"))
      val within = got.join(exact, "status")
        .filter(abs(col("adc_cust") - col("exact_cust")) >
          greatest(lit(1.0), col("exact_cust") * lit(0.05)))
        .isEmpty
      graft.sources.MaterializedView.read(s, mvPath)
        .select(col("status").as("o_orderstatus"), col("n"),
          col("sum_cents"))
        .withColumn("adc_ok", lit(within))
    }),

    // ASYNC MV AUTO-REFRESH — `mv.refreshmode = async` hands the
    // post-commit fold to a bounded executor: the WRITER's commit
    // returns while the refresh is still queued (pinned structurally by
    // wedging the executor — not a timing accident), the completed-
    // refresh counter moves, the view converges to exactly the
    // merged-from-scratch state (hash-matched), and a manual refresh
    // afterwards is a no-op.
    "q171_async_mv" -> ((s, dir) => {
      import graft.sources.{LogTable, MaterializedView => MV}
      val t = scratch(s, dir, "graft_q171")
      val tablePath = t + "/base"
      val mvPath = t + "/mv"
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        lit(0).as("version"), lit("U").as("op"))
      LogTable.create(s, tablePath, base, "o_year"): Unit
      MV.define(s, mvPath, tablePath, Seq("o_year", "status"),
        Seq(MV.MvCount("n"), MV.MvSum("sum_cents", "cents")),
        nBuckets = 16): Unit
      MV.refresh(s, mvPath): Unit
      MV.enableAutoRefresh(s, mvPath): Unit
      LogTable.setProperties(s, tablePath,
        Map("mv.refreshmode" -> "async")): Unit
      try {
        // wedge the executor: nothing refreshes until the latch opens,
        // so "the commit returned first" is structural
        val latch = new java.util.concurrent.CountDownLatch(1)
        LogTable.mvRefreshExecutor.submit(new Runnable {
          override def run(): Unit = latch.await()
        }): Unit
        val staleV = MV.refreshedVersion(s, mvPath)
        val c0 = LogTable.asyncRefreshes.get()
        LogTable.upsert(s, tablePath,
          base.filter(col("k") % 7 === 0)
            .withColumn("cents", col("cents") + 5L)
            .withColumn("version", lit(1)),
          Seq("k"), Seq("version"), "op"): Unit
        val returnedFirst = MV.refreshedVersion(s, mvPath) == staleV
        latch.countDown()
        LogTable.upsert(s, tablePath,
          base.filter(col("k") % 11 === 0)
            .withColumn("op", lit("D")).withColumn("version", lit(2)),
          Seq("k"), Seq("version"), "op"): Unit
        val dl = System.currentTimeMillis() + 120000
        while ((MV.refreshedVersion(s, mvPath) !=
            LogTable.latestVersion(s, tablePath) ||
            LogTable.asyncRefreshes.get() == c0) &&
          System.currentTimeMillis() < dl) Thread.sleep(50L)
        val ok = returnedFirst && LogTable.asyncRefreshes.get() > c0 &&
          MV.refreshedVersion(s, mvPath) ==
            LogTable.latestVersion(s, tablePath) &&
          MV.refresh(s, mvPath) == -1L
        MV.read(s, mvPath)
          .withColumnRenamed("status", "o_orderstatus")
          .withColumn("amv_ok", lit(ok))
      } finally MV.disableAutoRefresh(s, mvPath)
    }),

    // PARQUET MULTI-PART CHECKPOINT — the file list in bounded columnar
    // parts + a small meta JSON written last (completeness witness):
    // after checkpoint + expireLog the cold snapshot replays from the
    // parts alone, pinned IDENTICAL to the pre-checkpoint snapshot
    // (version + every file entry), and a JSON-checkpointed sibling of
    // the same content replays to the same live set — version identity
    // across formats.
    "q170_checkpoint_formats" -> ((s, dir) => {
      import graft.sources.LogTable
      def seed(t: String, props: Map[String, String]): Unit = {
        val base = Tables(s, dir, "supplier").select(
          col("s_suppkey").cast("long").as("k"),
          col("s_nationkey").cast("long").as("nk"),
          round(col("s_acctbal") * 100).cast("long").as("cents"))
        LogTable.create(s, t, base, Seq("nk"), statsCols = Seq("k"),
          tableProperties = props): Unit
        LogTable.append(s, t, base.filter(col("k") % 7 === 0)
          .select((col("k") + 8000000L).as("k"), col("nk"),
            (col("cents") + 11L).as("cents"))): Unit
      }
      val tp = scratch(s, dir, "graft_q170p")
      val tj = scratch(s, dir, "graft_q170j")
      seed(tp, Map(LogTable.CkptFormatProp -> "parquet",
        LogTable.CkptPartRowsProp -> "2"))
      seed(tj, Map.empty)
      val pre = LogTable.snapshot(s, tp)
      Seq(tp, tj).foreach { t =>
        LogTable.checkpoint(s, t): Unit
        LogTable.expireLog(s, t): Unit
        LogTable.dropCachedSnapshots(s, t)
      }
      val post = LogTable.snapshot(s, tp)
      val multiPart = new org.apache.hadoop.fs.Path(tp, "_graft_log")
        .getFileSystem(s.sessionState.newHadoopConf())
        .listStatus(new org.apache.hadoop.fs.Path(tp, "_graft_log"))
        .count(_.getPath.getName.matches(
          """\d{20}\.checkpoint\.[0-9a-f]{8}\.\d{5}\.\d{5}\.parquet""")) > 1
      val identOk = post.version == pre.version &&
        post.files.sortBy(_.name) == pre.files.sortBy(_.name)
      val sj = LogTable.snapshot(s, tj)
      val crossOk = sj.version == post.version &&
        sj.files.map(_.rows).sum == post.files.map(_.rows).sum
      val ckptOk = identOk && crossOk && multiPart
      LogTable.read(s, tp).groupBy(col("nk"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("ckpt_ok", lit(ckptOk))
    }),

    // NESTED (struct-field) SCHEMA EVOLUTION — metadata-only
    // ADD/RENAME/DROP of fields INSIDE a struct column: zero files
    // rewritten (pinned by file-list equality), data skipping keeps
    // pruning through the RETIRED dotted physical stats key
    // (`meta.score` at rest, addressed as `meta.pts` — scannedFiles
    // pinned 0 on a provably-empty predicate), old versions time-travel
    // under the OLD nested shape, and an old-shape append fills the
    // added field's DEFAULT recursively.
    // ARRAY-OF-STRUCTS EVOLUTION (round 18) — nested schema evolution
    // now crosses the array element layer via the `element` path
    // segment (the DSv2 convention): renaming a field INSIDE an
    // array<struct> column is metadata-only (file-list equality pinned),
    // old versions time-travel under the OLD element shape, an ADD with
    // DEFAULT inside the elements write-fills old-shape appends per
    // element, and a later PARENT rename keeps the element keys alive
    // (they scope by the parent's PHYSICAL path). The hashed output
    // explodes the evolved column off the final table.
    "q179_array_struct_evolution" -> ((s, dir) => {
      import graft.sources.LogTable
      import org.apache.spark.sql.connector.catalog.TableChange
      val t = scratch(s, dir, "graft_q179")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("entries", array(
          struct(concat(lit("t"), col("k")).as("tag"), col("cents").as("n")),
          struct(concat(lit("u"), col("k")).as("tag"),
            (col("cents") * 2 + 1).as("n"))))
        .drop("cents")
      LogTable.create(s, t, base, Seq("status"), statsCols = Seq("k"))
      val v1 = LogTable.snapshot(s, t)
      // v2: rename INSIDE the array elements — zero files rewritten
      LogTable.evolveSchema(s, t, Seq(TableChange.renameColumn(
        Array("entries", "element", "tag"), "label"))): Unit
      val v2 = LogTable.snapshot(s, t)
      val untouched =
        v2.files.map(_.name).sorted == v1.files.map(_.name).sorted
      // time travel: the old element shape still reads
      val oldShapeOk = LogTable.read(s, t, asOf = Some(v1.version))
        .select(explode(col("entries")).as("e"))
        .schema("e").dataType.asInstanceOf[
          org.apache.spark.sql.types.StructType]
        .fieldNames.toSeq == Seq("tag", "n")
      // v3: ADD a field inside the elements with a write-side DEFAULT
      LogTable.evolveSchema(s, t, Seq(TableChange.addColumn(
        Array("entries", "element", "w"),
        org.apache.spark.sql.types.LongType, true)),
        defaults = Map("entries.element.w" -> "7")): Unit
      // v4: an OLD-SHAPE append (elements lack w) — DEFAULT-fills
      import s.implicits._
      val oldShape = Seq((9000001L, "Z"))
        .toDF("k", "status")
        .withColumn("entries", array(
          struct(lit("zz").as("label"), lit(5L).as("n"))))
      LogTable.append(s, t, oldShape): Unit
      val fillOk = LogTable.read(s, t).filter(col("k") === 9000001L)
        .select(explode(col("entries")).as("e"))
        .select(col("e.w")).as[Long].head() == 7L
      val evoOk = untouched && oldShapeOk && fillOk
      LogTable.read(s, t)
        .select(col("status"), explode(col("entries")).as("e"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_elems"),
          sum(col("e.n")).cast("long").as("sum_n"))
        .withColumn("evo_ok", lit(evoOk))
    }),

    "q169_nested_evolution" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q169")
      val base = Tables(s, dir, "events").select(
        col("event_id").as("k"),
        col("event_type").as("etype"),
        struct(
          col("value").as("score"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("pk"),
          col("user_id").as("uid")).as("meta"))
      LogTable.create(s, t, base, Seq("etype"),
        statsCols = Seq("k", "meta.score"))
      val v0 = LogTable.snapshot(s, t).version
      val filesBefore = LogTable.snapshot(s, t).files.map(_.name).sorted
      s.sql(s"ALTER TABLE graft.`$t` RENAME COLUMN meta.score TO pts"): Unit
      s.sql(s"ALTER TABLE graft.`$t` DROP COLUMN meta.uid"): Unit
      s.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS " +
        "(meta.src STRING DEFAULT 'etl')"): Unit
      val filesAfter = LogTable.snapshot(s, t).files.map(_.name).sorted
      val zeroTouched = filesBefore == filesAfter
      // provably-empty predicate over the RENAMED leaf: decided on the
      // retired dotted stats key alone — zero scans
      val pr = LogTable.countWhere(s, t, col("meta.pts") > lit(1e18))
      val prunedOk = pr.count == 0L && pr.scannedFiles == 0 &&
        pr.excludedFiles == LogTable.snapshot(s, t).files.length
      // time travel: the pre-evolution version keeps the OLD shape
      val v0fields = LogTable.read(s, t, asOf = Some(v0))
        .schema("meta").dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.toSet
      val v0ok = v0fields == Set("score", "pk", "uid")
      // an OLD-SHAPE batch (struct without src): the DEFAULT fills it
      val batch = base.filter(col("k") % 97 === 0)
        .select((col("k") + 1000000000L).as("k"), col("etype"),
          struct((col("meta.score") + 1).as("pts"),
            col("meta.pk").as("pk")).as("meta"))
      LogTable.append(s, t, batch): Unit
      val nestOk = zeroTouched && prunedOk && v0ok
      LogTable.read(s, t).groupBy(col("etype"))
        .agg(count(lit(1)).as("n"),
          sum(col("meta.pk")).cast("long").as("sum_pk"),
          round(sum(col("meta.pts")), 2).as("sum_pts"),
          count(col("meta.src")).as("n_src"))
        .withColumn("nest_ok", lit(nestOk))
    }),

    // METADATA-ONLY COUNT — `SELECT count(*)` over a log table folds to
    // the log's exact row counts (a one-row LocalRelation; mc_ok pins
    // the fold IN THE PLAN), stays exact across an append and a
    // rewriting delete, and refuses to fold anything that could change
    // the answer (the filtered count below scans and is the oracle's
    // second row).
    "q168_metadata_count" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q168")
      val base = Tables(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      base.createOrReplaceTempView("q168_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (segment) " +
        "STATS BY (k) AS SELECT * FROM q168_base"): Unit
      s.sql(s"INSERT INTO graft.`$t` BY NAME " +
        "SELECT k + 90000000 AS k, segment, bal_cents " +
        "FROM q168_base WHERE k % 97 = 0"): Unit
      LogTable.deleteWhere(s, t, col("k") % 10 === 0): Unit
      def folded(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collectFirst {
          case _: org.apache.spark.sql.catalyst.plans.logical
            .LocalRelation => ()
        }.isDefined
      val total = s.sql(s"SELECT count(*) AS n FROM graft.`$t`")
      // boundary files (range-partitioned writes leave a few spanning
      // two segment values) keep this filtered count UNFOLDED — one
      // undecided file and the whole aggregate scans
      val boundary = s.sql(s"SELECT count(*) AS n FROM graft.`$t` " +
        "WHERE segment = 'BUILDING'")
      // the POSITIVE folds: a predicate every file provably
      // ALL-MATCHES (k >= 1 — every file's min is ≥ 1 with zero
      // nulls), and one every file provably EMPTIES (k < 0) — both
      // decided on stats alone, both hash-matched against the oracle
      val allMatch = s.sql(s"SELECT count(*) AS n FROM graft.`$t` " +
        "WHERE k >= 1")
      val noneMatch = s.sql(s"SELECT count(*) AS n FROM graft.`$t` " +
        "WHERE k < 0")
      val ok = folded(total) && !folded(boundary) &&
        folded(allMatch) && folded(noneMatch)
      total.withColumn("which", lit("total"))
        .unionByName(boundary.withColumn("which", lit("building")))
        .unionByName(allMatch.withColumn("which", lit("all_match")))
        .unionByName(noneMatch.withColumn("which", lit("none_match")))
        .withColumn("mc_ok", lit(ok))
    }),

    // TIME-TRAVEL OPERATIONS on the in-commit clock + VACUUM DRY RUN —
    // history's commit_time IS the TIMESTAMP AS OF clock (each
    // version's instant round-trips through versionAt), the CDF TVF
    // takes the same timestamps as bounds, and VACUUM DRY RUN
    // enumerates exactly what the real pass then reclaims (pinned:
    // preview set == deleted count, table content untouched).
    "q167_time_travel_ops" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q167")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"))
      base.createOrReplaceTempView("q167_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (o_year) " +
        "STATS BY (k) AS SELECT * FROM q167_base"): Unit
      // v2: delete a year (whole-partition rewrite leaves dead files)
      LogTable.deleteWhere(s, t, col("o_year") === 1995): Unit
      // v3: re-insert a filtered slice of it
      s.sql(s"INSERT INTO graft.`$t` BY NAME " +
        "SELECT k, status, cents, o_year FROM q167_base " +
        "WHERE o_year = 1995 AND k % 3 = 0"): Unit
      // the history clock round-trips through versionAt, per version
      val h = LogTable.history(s, t)
        .select("version", "commit_time").collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
      val clockOk = h.forall { case (v, ts) =>
        LogTable.versionAt(s, t, ts.getTime) == v
      }
      // TIMESTAMP AS OF v1's instant = the full original table
      val iso1 = h(1L).toInstant.toString
      val v1n = s.sql(s"SELECT count(*) AS n FROM graft.`$t` " +
        s"TIMESTAMP AS OF '$iso1'").head().getLong(0)
      // CDF between v1 and v3 BY TIMESTAMP: net deletes = the 2/3 of
      // 1995 that never came back
      val iso3 = h(3L).toInstant.toString
      val netDel = s.sql(s"SELECT count(*) AS n FROM graft_net_changes(" +
        s"'$t', TIMESTAMP'$iso1', TIMESTAMP'$iso3', 'k') " +
        "WHERE _change_type = 'delete'").head().getLong(0)
      val del1995 = base.filter(col("o_year") === 1995 &&
        col("k") % 3 =!= 0).count()
      // DRY RUN enumerates exactly what the real vacuum then deletes
      val preview = s.sql(s"VACUUM graft.`$t` RETAIN 0 HOURS FORCE DRY RUN")
        .count()
      val reclaimed = s.sql(s"VACUUM graft.`$t` RETAIN 0 HOURS FORCE")
        .head().getInt(0)
      val ok = clockOk && v1n == base.count() && netDel == del1995 &&
        preview == reclaimed.toLong
      s.sql(s"SELECT o_year, status AS o_orderstatus, count(*) AS n, " +
        s"sum(cents) AS sum_cents FROM graft.`$t` GROUP BY o_year, status")
        .withColumn("tt_ok", lit(ok))
    }),

    // SHALLOW CLONE — one metadata commit referencing the source's
    // files (zero data copied), then independent divergence: the source deletes
    // a window, the clone updates another, a FORCED source vacuum runs
    // in between — and the clone must still read its pre-divergence
    // state through the vacuum (the clone registry's protection).
    // Output: both sides' aggregates, side-tagged; the oracle restates
    // each side's transformation from raw orders.
    "q157_shallow_clone" -> ((s, dir) => {
      import graft.sources.LogTable
      val root = scratch(s, dir, "graft_q157")
      val src = root + "/src"; val dst = root + "/dst"
      val base = ordersShaped(s, dir, withOdate = false)
      LogTable.create(s, src, base, Seq("o_year"), Seq("k"))
      s.sql(s"CREATE TABLE graft.`$dst` SHALLOW CLONE graft.`$src`"): Unit
      val copied = Option(new java.io.File(dst).listFiles())
        .getOrElse(Array.empty)
      val noCopy = copied.forall(f => !f.getName.endsWith(".parquet"))
      // diverge both sides, then vacuum the SOURCE hard
      LogTable.deleteWhere(s, src,
        col("o_year") === 1996 && col("k") % 5 === 0): Unit
      s.sql(s"UPDATE graft.`$dst` SET cents = (cents * 110) div 100, " +
        "version = 1 WHERE o_year = 1997 AND k % 7 = 0"): Unit
      Thread.sleep(5L)
      LogTable.vacuum(s, src, 0L, force = true): Unit
      val props = LogTable.snapshot(s, dst).properties
      val ok = noCopy && props.get("clone.source").exists(_.endsWith("/src"))
      def agg(df: DataFrame, side: String): DataFrame =
        df.groupBy(col("o_year"), col("status").as("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
            sum("version").as("sum_version"))
          .withColumn("side", lit(side))
      agg(LogTable.read(s, src), "src")
        .unionByName(agg(s.sql(s"SELECT * FROM graft.`$dst`"), "clone"))
        .withColumn("clone_ok", lit(ok))
    }),

    // COLUMN MAPPING — metadata-only RENAME/DROP COLUMN (the Delta
    // name-mode architecture): the at-rest physical name never moves,
    // so the ALTER rewrites ZERO files (pinned below against the live
    // file list), old versions time-travel under their own names, DML
    // speaks the new name, and data skipping still consults the stats
    // keyed under the retired physical name (pinned metadata-only: a
    // provably-empty predicate on the RENAMED column must exclude every
    // file without scanning one).
    "q158_column_mapping" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q158")
      val base = ordersShaped(s, dir, withOdate = false)
      base.createOrReplaceTempView("q158_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (o_year) " +
        "STATS BY (k, cents) AS SELECT * FROM q158_base"): Unit
      val ref = s"graft.`$t`"
      val v0 = LogTable.snapshot(s, t).version
      val filesBefore = LogTable.snapshot(s, t).files.map(_.name).sorted
      s.sql(s"ALTER TABLE $ref RENAME COLUMN cents TO amount"): Unit
      s.sql(s"ALTER TABLE $ref DROP COLUMN op"): Unit
      val filesAfter = LogTable.snapshot(s, t).files.map(_.name).sorted
      val zeroTouched = filesBefore == filesAfter
      // DML under the new name (victims rewrite under the SAME physical
      // layout — the mapping survives the rewrite)
      s.sql(s"UPDATE $ref SET amount = amount + 5, version = 1 " +
        "WHERE o_year = 1997 AND k % 11 = 0"): Unit
      // metadata-only proof through the mapping: every cents value is
      // positive, so `amount < 0` must EXCLUDE every file from the
      // stats alone — zero scans, through the old physical stats key
      val pr = LogTable.countWhere(s, t, col("amount") < 0L)
      val prunedOk = pr.count == 0L && pr.scannedFiles == 0 &&
        pr.excludedFiles == LogTable.snapshot(s, t).files.length
      val v0df = LogTable.read(s, t, asOf = Some(v0))
      val v0ok = v0df.columns.contains("cents") && v0df.columns.contains("op")
      val mapOk = zeroTouched && prunedOk && v0ok
      def agg(df: DataFrame, amountCol: String, side: String): DataFrame =
        df.groupBy(col("o_year"))
          .agg(count(lit(1)).as("n"), sum(col(amountCol)).as("sum_amount"),
            sum("version").as("sum_version"))
          .withColumn("side", lit(side))
      agg(s.sql(s"SELECT * FROM $ref"), "amount", "current")
        .unionByName(agg(v0df, "cents", "v0"))
        .withColumn("map_ok", lit(mapOk))
    }),

    // HOURLY hidden partitioning — `PARTITIONED BY (hour(ts))` derives
    // ts_hour = date_trunc('HOUR', ts) (monotone, so a bound on ts
    // ALONE prunes files through the implied ts_hour bound — pinned
    // metadata-only below), the Iceberg hours() transform.
    "q163_hour_partitioning" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q163")
      Tables(s, dir, "events")
        .select(col("user_id"), col("value"), col("ts"))
        .createOrReplaceTempView("q163_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (hour(ts)) " +
        "STATS BY (user_id) AS SELECT * FROM q163_base"): Unit
      val snap = LogTable.snapshot(s, t)
      val pr = LogTable.countWhere(s, t,
        col("ts") < expr("TIMESTAMP'2024-01-02 00:00:00'"))
      val ok = snap.partitionCols == Seq("ts_hour") &&
        snap.properties.get("gen.ts_hour")
          .contains("date_trunc('HOUR', ts)") &&
        pr.excludedFiles > 0
      s.sql(s"SELECT date_format(ts_hour, 'yyyy-MM-dd HH') AS hr, " +
        s"count(*) AS n, round(sum(value), 2) AS sum_value " +
        s"FROM graft.`$t` " +
        "WHERE ts < TIMESTAMP'2024-01-03 00:00:00' GROUP BY ts_hour")
        .withColumn("hour_ok", lit(ok))
    }),

    // PARTITION EVOLUTION — `ALTER TABLE ... REPLACE PARTITIONED BY
    // (month(odate))` re-declares the spec in ONE metadata commit
    // (files pinned untouched), new writes cluster by the derived
    // month, files from BOTH specs answer reads/DML exactly, old rows
    // COMPUTE the late generated column at read (never stored), and
    // OPTIMIZE migrates old-spec files into the new layout (spec
    // debt). Output: the per-month rollup read THROUGH the derived
    // column; the oracle restates it from the source column.
    "q164_partition_evolution" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q164")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderdate").as("odate"),
        year(col("o_orderdate")).as("o_year"))
      base.createOrReplaceTempView("q164_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (o_year) " +
        "STATS BY (k) AS SELECT * FROM q164_base"): Unit
      val filesBefore = LogTable.snapshot(s, t).files.map(_.name).toSet
      s.sql(s"ALTER TABLE graft.`$t` " +
        "REPLACE PARTITIONED BY (month(odate))").collect(): Unit
      val snap = LogTable.snapshot(s, t)
      val metaOnly = snap.files.map(_.name).toSet == filesBefore
      val specOk = snap.partitionCols == Seq("odate_month") &&
        snap.properties.get("gen.odate_month")
          .contains("date_format(odate, 'yyyy-MM')") &&
        snap.properties.get("pspec.lategen").contains("odate_month") &&
        snap.statsCols.exists(_.equalsIgnoreCase("o_year"))
      // ingest under the NEW spec — the derived column is recomputed,
      // never supplied
      s.sql(s"INSERT INTO graft.`$t` BY NAME " +
        "SELECT k + 50000000 AS k, status, cents, odate, o_year " +
        "FROM q164_base WHERE o_year = 1994 AND k % 61 = 0"): Unit
      // mixed-spec row DML keyed on the new spec's SOURCE column
      LogTable.deleteWhere(s, t,
        col("odate") >= lit("1992-03-01").cast("timestamp_ntz") &&
          col("odate") < lit("1992-04-01").cast("timestamp_ntz")): Unit
      // the late generated column never drifts from its source — on old
      // rows it is COMPUTED (the files predate it), on new rows stored
      val driftFree = s.sql(s"SELECT count(*) AS n FROM graft.`$t` " +
        "WHERE odate_month <> date_format(odate, 'yyyy-MM')")
        .head().getLong(0) == 0L
      // old-column pruning survives the evolution (o_year rides
      // statsCols now); time travel reads the pre-evolution state
      val cwOld = LogTable.countWhere(s, t, col("o_year") === 1997)
      val v1n = LogTable.read(s, t, asOf = Some(1L)).count()
      // OPTIMIZE migrates every old-spec file (spec debt) into the new
      // layout; after it, a bound on the SOURCE column excludes files
      // through the derived column's stats alone
      s.sql(s"OPTIMIZE graft.`$t` MAX 8 FILES PER PARTITION").collect(): Unit
      val migrated = LogTable.snapshot(s, t)
      val migratedOk = migrated.files.forall(_.stats.keys
        .exists(_.equalsIgnoreCase("odate_month")))
      val cwNew = LogTable.countWhere(s, t,
        col("odate") < lit("1993-01-01").cast("timestamp_ntz"))
      val ok = metaOnly && specOk && driftFree &&
        cwOld.excludedFiles > 0 && v1n == base.count() &&
        migratedOk && cwNew.excludedFiles > 0
      s.sql(s"SELECT odate_month AS om, count(*) AS n, " +
        s"sum(cents) AS sum_cents FROM graft.`$t` GROUP BY odate_month")
        .withColumn("pevo_ok", lit(ok))
    }),

    // COLUMN DEFAULTS + SCOPED OPTIMIZE — `ADD COLUMNS (src STRING
    // DEFAULT 'etl')` is metadata-only (old rows NULL, the Delta
    // semantics); an ingest that OMITS the column fills the declared
    // literal, one that supplies it wins; `OPTIMIZE ... WHERE` compacts
    // ONLY the matching partition's files (pinned: the other years'
    // file names are byte-identical after the run).
    "q165_column_defaults" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q165")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"))
      base.createOrReplaceTempView("q165_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (o_year) " +
        "STATS BY (k) AS SELECT * FROM q165_base"): Unit
      val filesBefore = LogTable.snapshot(s, t).files.map(_.name).toSet
      s.sql(s"ALTER TABLE graft.`$t` ADD COLUMNS " +
        "(src STRING DEFAULT 'etl')"): Unit
      val snapA = LogTable.snapshot(s, t)
      val metaOnly = snapA.files.map(_.name).toSet == filesBefore &&
        snapA.properties.get("coldefault.src").contains("'etl'")
      // two fragmenting ingests into 1993 — one OMITS src (defaults),
      // one supplies it
      s.sql(s"INSERT INTO graft.`$t` BY NAME " +
        "SELECT k + 50000000 AS k, status, cents, o_year " +
        "FROM q165_base WHERE o_year = 1993 AND k % 41 = 0"): Unit
      s.sql(s"INSERT INTO graft.`$t` BY NAME " +
        "SELECT k + 60000000 AS k, status, cents, o_year, " +
        "'manual' AS src FROM q165_base " +
        "WHERE o_year = 1993 AND k % 43 = 0"): Unit
      // scoped maintenance: compact ONLY 1993; every other year's file
      // set must come through byte-identical
      val others = LogTable.snapshot(s, t).files
        .filterNot(f => f.pmin == "1993" || f.pmax == "1993")
        .map(_.name).toSet
      s.sql(s"OPTIMIZE graft.`$t` WHERE o_year = 1993 " +
        "MAX 2 FILES PER PARTITION").collect(): Unit
      val after = LogTable.snapshot(s, t)
      val scopedOk = after.files
        .filterNot(f => f.pmin == "1993" || f.pmax == "1993")
        .map(_.name).toSet == others
      val ok = metaOnly && scopedOk
      s.sql(s"SELECT o_year, coalesce(src, 'legacy') AS src, " +
        s"count(*) AS n, sum(cents) AS sum_cents FROM graft.`$t` " +
        "GROUP BY o_year, src")
        .withColumn("dflt_ok", lit(ok))
    }),

    // INCREMENTAL NDV — `ndv.cols` columns carry a per-file HLL sketch
    // written by the SAME one-pass stats scan every write already runs;
    // the snapshot unions them into table-level distinct counts that
    // feed CBO column statistics. No ANALYZE rescan exists or is
    // needed; deletes update the estimate because removed files'
    // sketches drop out of the union. ndv_ok pins the high-cardinality
    // estimate within HLL tolerance, the low-cardinality one exactly,
    // the post-delete refresh, and the CBO surface.
    "q166_ndv_stats" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q166")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"))
      base.createOrReplaceTempView("q166_base")
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"),
        tableProperties = Map("ndv.cols" -> "k,status")): Unit
      LogTable.deleteWhere(s, t, col("o_year") === 1998): Unit
      val snap = LogTable.snapshot(s, t)
      val live = LogTable.read(s, t)
      val exactK = live.select("k").distinct().count()
      val estK = snap.ndv.getOrElse("k", 0L)
      val withinTol = estK > 0L &&
        math.abs(estK - exactK).toDouble / exactK < 0.15
      val statusExact = snap.ndv.get("status").contains(3L)
      // CBO surface checked in a CHILD session with the flag pinned on —
      // never toggle the shared session's conf mid-gate
      val cboS = s.newSession()
      cboS.conf.set("spark.sql.cbo.enabled", "true")
      val cboOk = org.apache.spark.sql.GraftBridge.withActive(cboS) {
        val st = LogTable.table(cboS, t).queryExecution.optimizedPlan.stats
        st.attributeStats.exists { case (a, cs) =>
          a.name == "k" && cs.distinctCount.contains(BigInt(estK))
        } && st.rowCount.contains(BigInt(live.count()))
      }
      val ok = withinTol && statusExact && cboOk
      s.sql(s"SELECT o_year, status AS o_orderstatus, count(*) AS n, " +
        s"sum(cents) AS sum_cents FROM graft.`$t` GROUP BY o_year, status")
        .withColumn("ndv_ok", lit(ok))
    }),

    // MERGE WITH SCHEMA EVOLUTION — a drifting source (one NEW column,
    // one strictly-WIDER column) evolves the target inside the merge's
    // own commit: one version, old files untouched (schema-on-read
    // NULL-fills), refused loud without the clause.
    "q162_merge_schema_evolution" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q162")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("int").as("cents"),
        year(col("o_orderdate")).as("o_year"))
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"))
      val vPre = LogTable.latestVersion(s, t)
      val src = base.filter(col("o_year") === 1997 && col("k") % 13 === 0)
        .select(col("k"), col("status"),
          (col("cents").cast("long") + 1000L).as("cents"),
          col("o_year"), lit("upd").as("note"))
        .unionByName(
          base.filter(col("o_year") === 1996 && col("k") % 97 === 0)
            .select((col("k") + 90000000L).as("k"), col("status"),
              col("cents").cast("long").as("cents"), col("o_year"),
              lit("new").as("note")))
      src.createOrReplaceTempView("q162_src")
      // without the clause: the unknown column refuses loud
      val refused =
        try {
          s.sql(s"MERGE INTO graft.`$t` t USING q162_src s ON t.k = s.k " +
            "WHEN MATCHED THEN UPDATE SET cents = s.cents, note = s.note")
          false
        } catch { case _: IllegalArgumentException => true }
      s.sql(s"MERGE WITH SCHEMA EVOLUTION INTO graft.`$t` t " +
        "USING q162_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET cents = s.cents, note = s.note " +
        "WHEN NOT MATCHED THEN INSERT (k, status, cents, o_year, note) " +
        "VALUES (s.k, s.status, s.cents, s.o_year, s.note)"): Unit
      val snap = LogTable.snapshot(s, t)
      val ok = refused && snap.version == vPre + 1 &&
        snap.schema("cents").dataType ==
          org.apache.spark.sql.types.LongType &&
        snap.schema.fieldNames.contains("note")
      s.sql(s"SELECT o_year, count(*) AS n, sum(cents) AS sum_cents, " +
        s"count(note) AS n_note FROM graft.`$t` GROUP BY o_year")
        .withColumn("mse_ok", lit(ok))
    }),

    // RENAME TABLE — one atomic directory move (the log is
    // self-contained: relative file names), with history, time travel
    // and stats skipping intact at the new home; DML before and after
    // the move land in one continuous version chain.
    "q161_rename_table" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q161")
      val t2 = t + "_moved"
      // scratch() cleared t; the rename TARGET from a previous run must
      // clear too, or re-running the gate refuses on the stale dir
      val fs2 = new org.apache.hadoop.fs.Path(t2)
        .getFileSystem(s.sessionState.newHadoopConf())
      if (fs2.exists(new org.apache.hadoop.fs.Path(t2)))
        fs2.delete(new org.apache.hadoop.fs.Path(t2), true): Unit
      val base = ordersShaped(s, dir, withOdate = false)
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"))
      s.sql(s"UPDATE graft.`$t` SET cents = cents + 3, version = 1 " +
        "WHERE o_year = 1996 AND k % 9 = 0"): Unit
      val vPre = LogTable.latestVersion(s, t)
      LogTable.renameTable(s, t, t2)
      // the move carried the whole version chain (NO commit of its own);
      // DML continues on it at the new home
      val vPost = LogTable.latestVersion(s, t2)
      s.sql(s"DELETE FROM graft.`$t2` WHERE o_year = 1998 AND k % 4 = 0"): Unit
      val snap = LogTable.snapshot(s, t2)
      val fsT = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(s.sessionState.newHadoopConf())
      val ok = !fsT.exists(new org.apache.hadoop.fs.Path(t)) &&
        vPre == 2L && vPost == vPre && snap.version == vPre + 1 &&
        LogTable.read(s, t2, asOf = Some(1L)).count() ==
          LogTable.read(s, t2, asOf = Some(2L)).count() &&
        LogTable.countWhere(s, t2, col("k") < 0L).scannedFiles == 0
      s.sql(s"SELECT o_year, status AS o_orderstatus, count(*) AS n, " +
        s"sum(cents) AS sum_cents, sum(version) AS sum_version " +
        s"FROM graft.`$t2` GROUP BY o_year, status")
        .withColumn("rename_ok", lit(ok))
    }),

    // UNPARTITIONED log tables — zero partition columns, one partition
    // tuple: the dimension/lookup-table shape, with the full DML
    // surface (CTAS without PARTITIONED BY, DELETE, UPDATE, INSERT,
    // stats skipping off declared statsCols alone).
    "q159_unpartitioned" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q159")
      Tables(s, dir, "customer").select(
        col("c_custkey").as("k"), col("c_mktsegment").as("segment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
        .createOrReplaceTempView("q159_base")
      s.sql(s"CREATE TABLE graft.`$t` STATS BY (k) " +
        "AS SELECT * FROM q159_base"): Unit
      val ref = s"graft.`$t`"
      val unpart = LogTable.snapshot(s, t).partitionCols.isEmpty
      s.sql(s"DELETE FROM $ref WHERE k % 10 = 0"): Unit
      s.sql(s"UPDATE $ref SET bal_cents = bal_cents + 100 " +
        "WHERE segment = 'BUILDING'"): Unit
      s.sql(s"INSERT INTO $ref VALUES (9000001, 'SYNTH', 5), " +
        "(9000002, 'SYNTH', 7)"): Unit
      // stats skipping works with no partition column at all: a
      // provably-empty key predicate decides from metadata alone
      val pr = LogTable.countWhere(s, t, col("k") < 0L)
      val ok = unpart && pr.count == 0L && pr.scannedFiles == 0
      s.sql(s"SELECT segment, count(*) AS n, sum(bal_cents) AS sum_bal " +
        s"FROM $ref GROUP BY segment")
        .withColumn("unpart_ok", lit(ok))
    }),

    // BUCKET(N) HIDDEN PARTITIONING — pmod(hash(k), N) as a generated
    // partition column (the Iceberg bucket transform): a point lookup
    // on the high-cardinality source key opens ~1/N of the files via
    // the implied bucket equality (pinned below), while range
    // predicates — for which hash buckets prove nothing — stay exact
    // through the source-column fallback.
    "q160_bucket_pruning" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q160")
      val base = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      // one file per bucket (deterministic regardless of the session's
      // parallelism) — the shape a real bucketed layout converges to
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      try {
        s.conf.set("spark.sql.shuffle.partitions", "32")
        LogTable.create(s, t, base, Seq("k_bucket"),
          statsCols = Seq("cents"),
          generatedColumns = Map("k_bucket" -> "pmod(hash(k), 16)"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      val files = LogTable.snapshot(s, t).files.length
      // three point lookups: each must exclude MOST files metadata-only
      val prunes = Seq(1L, 32775L, 59998L).map(k =>
        LogTable.countWhere(s, t, col("k") === k))
      val ok = files >= 8 && prunes.forall(_.excludedFiles > files / 2)
      // the answer itself (hash-compared): the looked-up rows plus a
      // range aggregate that the bucket CANNOT help with
      val points = s.sql(s"SELECT CAST(k AS BIGINT) AS k, status, cents " +
        s"FROM graft.`$t` WHERE k IN (1, 32775, 59998)")
      val range = s.sql(s"SELECT CAST(-1 AS BIGINT) AS k, 'R' AS status, " +
        s"sum(cents) AS cents FROM graft.`$t` WHERE k < 1000")
      points.unionByName(range).withColumn("bucket_ok", lit(ok))
    }),

    "q151_sql_lifecycle" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q151")
      val base = ordersShaped(s, dir, withOdate = false)
      // even the table's BIRTH is a statement (CTAS onto LogTable.create)
      base.createOrReplaceTempView("q151_base")
      s.sql(s"CREATE TABLE graft.`$t` PARTITIONED BY (o_year) " +
        "STATS BY (k) AS SELECT * FROM q151_base"): Unit
      val ref = s"graft.`$t`"
      s.sql(s"ALTER TABLE $ref ADD CONSTRAINT cents_nonneg " +
        "CHECK (cents >= 0)"): Unit
      val caught =
        try {
          s.sql(s"INSERT INTO $ref VALUES (1, 'O', -1, 1997, 9, 'U')")
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("cents_nonneg") }
      s.sql(s"UPDATE $ref SET cents = cents + 1, version = 1 " +
        "WHERE o_year = 1997 AND k % 10 = 0"): Unit
      // the change-feed TVF surfaces the UPDATE window's exact row
      // deltas — checked BEFORE the forced vacuum below breaks feeds
      // behind the head (by contract)
      val updated = base.filter(col("o_year") === 1997 && col("k") % 10 === 0)
        .count()
      val tvfPost = s.sql(s"SELECT count(*) AS n FROM " +
        s"graft_net_changes('$t', 2, 3, 'k') " +
        "WHERE _change_type = 'update_postimage'").head().getLong(0)
      val filesBefore = LogTable.snapshot(s, t).files.length
      s.sql(s"OPTIMIZE $ref MAX 1 FILES PER PARTITION"): Unit
      val filesAfter = LogTable.snapshot(s, t).files.length
      val floorCaught =
        try { s.sql(s"VACUUM $ref RETAIN 0 HOURS"); false }
        catch { case _: IllegalArgumentException => true }
      Thread.sleep(5L) // ms-mtime granularity: the dead files must age
      val vacd = s.sql(s"VACUUM $ref RETAIN 0 HOURS FORCE")
        .head().getInt(0)
      val ops = s.sql(s"DESCRIBE HISTORY $ref").groupBy("operation")
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      s.sql(s"ALTER TABLE $ref DROP CONSTRAINT cents_nonneg"): Unit
      val ok = caught && floorCaught && filesAfter <= filesBefore &&
        vacd > 0 && tvfPost == updated &&
        Seq("CREATE", "ADD CONSTRAINT", "UPDATE", "COMPACT")
          .forall(ops.get(_).contains(1L)) &&
        LogTable.snapshot(s, t).constraints.isEmpty
      s.sql(s"SELECT o_year, status AS o_orderstatus, count(*) AS n, " +
        s"sum(cents) AS sum_cents, sum(version) AS sum_version " +
        s"FROM $ref GROUP BY o_year, status")
        .withColumn("lifecycle_ok", lit(ok))
    }),

    // SQL FRONT DOOR — the whole DML surface through spark.sql over
    // `graft.`<dir>``: DELETE, UPDATE, MERGE (clause mapping), INSERT
    // (blind append) and VERSION AS OF time travel, each landing on the
    // SAME transactional entry points as the programmatic API (the
    // resolution rule in GraftExtensions — no second write path). The
    // oracle restates the four statements as a WITH-chain over raw
    // orders; sql_ok pins the time-travel count and one commit per
    // operation kind in the history ledger.
    "q148_sql_surface" -> ((s, dir) => {
      import graft.sources.LogTable
      val t = scratch(s, dir, "graft_q148")
      val base = ordersShaped(s, dir, withOdate = false)
      LogTable.create(s, t, base, Seq("o_year"), Seq("k"))
      val ref = s"graft.`$t`"
      val n0 = base.count()
      s.sql(s"DELETE FROM $ref WHERE o_year = 1996 AND k % 5 = 0"): Unit
      s.sql(s"UPDATE $ref SET cents = (cents * 110) div 100, version = 1 " +
        "WHERE o_year = 1997 AND k % 7 = 0"): Unit
      val y94 = base.filter(col("o_year") === 1998)
      y94.filter(col("k") % 7 === 0 || col("k") % 13 === 0)
        .withColumn("act", when(col("k") % 13 === 0, "D").otherwise("U"))
        .withColumn("newcents", col("cents") + 1111)
        .select("k", "status", "newcents", "o_year", "act")
        .unionByName(y94.filter(col("k") % 11 === 0)
          .select((col("k") + 10000000L).as("k"), col("status"),
            (col("cents") + 5).as("newcents"), col("o_year"),
            lit("I").as("act")))
        .createOrReplaceTempView("q148_src")
      s.sql(
        s"""MERGE INTO $ref t USING q148_src s ON t.k = s.k
           |WHEN MATCHED AND s.act = 'D' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET cents = s.newcents, version = 2
           |WHEN NOT MATCHED THEN INSERT (k, status, cents, o_year, version, op)
           |  VALUES (s.k, s.status, s.newcents, s.o_year, 3, 'U')
           |""".stripMargin): Unit
      s.sql(s"INSERT INTO $ref SELECT k + 20000000, status, cents * 2, " +
        s"o_year, 4, 'U' FROM $ref WHERE o_year = 1999 AND k % 50 = 0"): Unit
      val nv1 = s.sql(s"SELECT count(*) AS n FROM $ref VERSION AS OF 1")
        .head().getLong(0)
      val ops = LogTable.history(s, t).groupBy("operation").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ok = nv1 == n0 &&
        Seq("DELETE", "UPDATE", "MERGE_INTO", "APPEND")
          .forall(ops.get(_).contains(1L))
      s.sql(s"SELECT o_year, status AS o_orderstatus, count(*) AS n, " +
        s"sum(cents) AS sum_cents, sum(version) AS sum_version " +
        s"FROM $ref GROUP BY o_year, status")
        .withColumn("sql_ok", lit(ok))
    }),

    // CHECK CONSTRAINTS — ingest-time data quality as a table property:
    // the constraint lands as its own (dataChange=false) commit after a
    // one-off validation scan, a VALID merge then commits, and a batch
    // smuggling one violating row fails the WHOLE transaction before
    // its commit — constraint_ok pins the caught failure, the frozen
    // version, and the persisted constraint text. The final aggregate
    // restates the valid merge only; a leaked violating row (or a
    // constraint that silently stopped enforcing) changes it hash-red.
    "q145_logtable_constraint" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q145")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, t, base, Seq("o_year"), Seq("cents"))
      graft.sources.LogTable.addConstraint(s, t, "cents_nonneg",
        "cents >= 0"): Unit
      val v = graft.sources.LogTable.upsert(s, t,
        ordersUpdDel(base, col("o_year") === 1997),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op")
      val caught =
        try {
          graft.sources.LogTable.upsert(s, t,
            base.filter(col("k") % 501 === 0)
              .withColumn("cents", lit(-1L))
              .withColumn("version", lit(9)),
            keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op")
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("cents_nonneg") }
      val snap = graft.sources.LogTable.snapshot(s, t)
      val ok = v == 3L && caught && snap.version == 3L &&
        snap.constraints == Map("cents_nonneg" -> "cents >= 0")
      graft.sources.LogTable.read(s, t)
        .groupBy(col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("constraint_ok", lit(ok))
    }),

    // FULL MERGE INTO — the general clause form beyond upsert's fixed
    // latest-wins: one transaction applies a CONDITIONAL matched-update
    // (only when the source price is strictly higher, bumping a version
    // counter), a matched-delete on an op marker, and a not-matched
    // insert — all as one full-outer-join plan over stats-pruned victim
    // files. The oracle restates the same clause semantics in SQL (LEFT
    // JOIN + CASE for the survivors, anti-join for the inserts), so a
    // clause mis-ordered, a condition evaluated on the wrong side, or a
    // rider row lost through the rewrite is hash-red; merge_version
    // pins the single commit.
    "q141_logtable_merge_into" -> ((s, dir) => {
      val t = scratch(s, dir, "graft_q141")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, t, base, Seq("o_year"), Seq("cents"))
      val inYears = col("o_year").isin(1997, 1999)
      val upd = base.filter(col("k") % 7 === 0 && inYears)
        .withColumn("cents", expr("(cents * 110) div 100"))
      val del = base.filter(col("k") % 13 === 0 && col("k") % 7 =!= 0 && inYears)
        .withColumn("op", lit("D"))
      val ins = base.filter(col("k") % 11 === 0 && inYears)
        .withColumn("k", col("k") + lit(10000000L))
        .withColumn("status", lit("N"))
        .withColumn("cents", expr("cents div 2"))
      val src = upd.unionByName(del).unionByName(ins)
        .select("k", "status", "cents", "o_year", "op")
      val v = graft.sources.LogTable.mergeInto(s, t, src, Seq("k"))
        .whenMatchedDelete(condition = Some("s.op = 'D'"))
        .whenMatchedUpdate(
          Map("cents" -> "s.cents", "version" -> "t.version + 1"),
          condition = Some("s.cents > t.cents"))
        .whenNotMatchedInsert(values = Map("version" -> "0"))
        .run()
      graft.sources.LogTable.read(s, t)
        .groupBy(col("o_year"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("version")).as("sum_version"))
        .withColumn("merge_version", lit(v).cast("int"))
    }),

    // CHANGE FEED off the log: after two merge commits, readChanges(1, 3)
    // must reconstruct version 3 from version 1 EXACTLY —
    // `snapshot(1) ∖ deletes ∪ inserts ≡ snapshot(3)` as multisets
    // (pinned by cdf_consistent via two exceptAll probes), and the
    // aggregate of the RECONSTRUCTION restates the final merged state
    // from the raw table. A missed removed file, a double-counted add,
    // or a vacuumed-too-early change window is hash-red.
    "q130_logtable_changes" -> ((s, dir) => {
      val root = scratch(s, dir, "graft_q130")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, root, base, "o_year") // v1
      val inYears = col("o_year").isin(1997, 1999)
      val ins = base.filter(col("k") % 11 === 0 && inYears)
        .withColumn("k", col("k") + lit(10000000L))
        .withColumn("status", lit("N"))
        .withColumn("cents", expr("cents div 2"))
        .withColumn("version", lit(1))
      graft.sources.LogTable.upsert(s, root,
        ordersUpdDel(base, inYears).unionByName(ins),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit // v2
      val upd3 = base.filter(col("k") % 5 === 0 && col("o_year") === 1996)
        .withColumn("cents", expr("cents div 3"))
        .withColumn("version", lit(3))
      graft.sources.LogTable.upsert(s, root, upd3,
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op"): Unit // v3
      val ch = graft.sources.LogTable.readChanges(s, root, 1L, 3L)
      val insRows = ch.filter(col("_change_type") === "insert").drop("_change_type")
      val delRows = ch.filter(col("_change_type") === "delete").drop("_change_type")
      val recon = graft.sources.LogTable.read(s, root, Some(1L))
        .exceptAll(delRows).unionAll(insRows)
      val direct = graft.sources.LogTable.read(s, root, Some(3L))
      val consistent = multisetEqual(recon, direct)
      recon
        .groupBy(col("o_year"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("cdf_consistent", lit(consistent))
        .withColumn("from_version", lit(1))
        .withColumn("to_version", lit(3))
    }),

    // MULTI-COLUMN partitioning: the q125 merge discipline on a
    // (o_year, status)-partitioned log table — the batch touches exactly
    // the (1997, 'O') tuple, so the rewrite prunes on BOTH partition
    // columns (a file in 1997 with only 'F' rows survives by name; the
    // spec pins that), and the snapshot restates the merge. An update
    // may not move a row across its partition tuple — the batch keeps
    // status fixed, the contract `upsertPartitioned` documents.
    "q131_logtable_multipart" -> ((s, dir) => {
      val root = scratch(s, dir, "graft_q131")
      val base = ordersShaped(s, dir, withOdate = false)
      graft.sources.LogTable.create(s, root, base, Seq("o_year", "status"))
      val touched = col("o_year") === 1997 && col("status") === "O"
      val v = graft.sources.LogTable.upsert(s, root,
        ordersUpdDel(base, touched),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op")
      val nPcols =
        graft.sources.LogTable.snapshot(s, root).partitionCols.length
      graft.sources.LogTable.read(s, root)
        .groupBy(col("o_year"), col("status").as("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("log_version", lit(v).cast("int"))
        .withColumn("n_partition_cols", lit(nPcols))
    }),

    // q114's schema-drift contract INSIDE the log table: the pre-1998
    // epoch commits without a priority column, the later epoch arrives
    // carrying it, and the upsert widens the committed schema WITHOUT
    // rewriting the old epoch's files (schema-on-read NULLs, pinned by
    // n_priority being zero exactly for the old years). A silently
    // dropped new column, a wrong NULL fill, or an old-file rewrite that
    // loses rows is hash-red.
    "q128_logtable_evolution" -> ((s, dir) => {
      val outRoot = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir")),
        "graft_q128_" + new java.io.File(dir).getName.replace('.', '_'))
      val fs = outRoot.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(outRoot)) fs.delete(outRoot, true): Unit
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        year(col("o_orderdate")).as("o_year"),
        col("o_orderpriority"),
        lit(0).as("version"), lit("U").as("op"))
      graft.sources.LogTable.create(s, outRoot.toString,
        orders.filter(col("o_year") <= 1997).drop("o_orderpriority"), "o_year")
      graft.sources.LogTable.upsert(s, outRoot.toString,
        orders.filter(col("o_year") > 1997)
          .withColumn("version", lit(1))
          .withColumnRenamed("o_orderpriority", "priority"),
        keyCols = Seq("k"), orderCols = Seq("version"), opCol = "op",
        mergeSchema = true)
      graft.sources.LogTable.read(s, outRoot.toString)
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          count(col("priority")).as("n_priority"))
    }),

    // Bucketed round trip: lineitem and orders written BUCKETED (and
    // sorted) on the order key with the same bucket count, read back, and
    // fact-fact joined — the shuffle-free repeated-join story: both scans
    // report the bucket layout, so the join needs NO exchange on either
    // side (PlanAssertSpec pins exactly one exchange in the whole plan —
    // the final group-by — with broadcast disabled). At 100 TB this is
    // the difference between re-shuffling both fact tables on every join
    // and paying the shuffle once at write time. The oracle joins the
    // ORIGINAL tables: identical output proves the bucketed write→read
    // cycle lossless and the bucket-pruned join complete.
    "q68_bucketed_join" -> ((s, dir) => {
      val sf = new java.io.File(dir).getName.replace('.', '_')
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      Sources.writeBucketed(li, s"g68_lineitem_$sf", Seq("l_orderkey"), numBuckets = 8)
      Sources.writeBucketed(ord, s"g68_orders_$sf", Seq("o_orderkey"), numBuckets = 8)
      s.table(s"g68_lineitem_$sf")
        .join(s.table(s"g68_orders_$sf"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
    }))

  def oracle: Map[String, String] = Map(
    "q176_identity" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_mktsegment AS segment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |final AS (
        |  SELECT segment, cents, 'base' AS src FROM base
        |  UNION ALL
        |  SELECT segment, cents + 5, 'w1' FROM base WHERE id % 13 = 0
        |  UNION ALL
        |  SELECT segment, cents + 7, 'w2' FROM base WHERE id % 17 = 0)
        |SELECT segment, src, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS id_ok
        |FROM final GROUP BY segment, src""".stripMargin,
    "q184_row_tracking" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |upd AS (
        |  SELECT k, status,
        |    CASE WHEN k % 9 = 0 THEN cents + 3 ELSE cents END AS cents,
        |    o_year, version
        |  FROM base),
        |batch_upd AS (
        |  SELECT k, status, cents + 1 AS cents, o_year, 9 AS version
        |  FROM base WHERE k % 11 = 0),
        |merged AS (
        |  SELECT u.* FROM upd u
        |  WHERE NOT EXISTS (SELECT 1 FROM batch_upd b WHERE b.k = u.k)
        |  UNION ALL SELECT * FROM batch_upd
        |  UNION ALL SELECT k + 90000000, status, cents, o_year, version
        |  FROM batch_upd)
        |SELECT o_year, status, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  TRUE AS row_track_ok
        |FROM merged GROUP BY 1, 2""".stripMargin,

    "q183_map_struct_evolution" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS label,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS score,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |final AS (
        |  SELECT k, o_year, label, score, CAST(NULL AS VARCHAR) AS note
        |  FROM base
        |  UNION ALL SELECT 90000001, 1999, 'Z', 5, 'y')
        |SELECT o_year, label, count(*) AS n,
        |  CAST(sum(score) AS BIGINT) AS sum_score,
        |  count(note) AS n_note, TRUE AS map_evo_ok
        |FROM final GROUP BY 1, 2""".stripMargin,

    "q182_null_partitions" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, nullif(o_orderstatus, 'O') AS seg,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |upd AS (
        |  SELECT k, seg,
        |    CASE WHEN seg IS NULL AND k % 5 = 0 THEN cents + 7
        |         ELSE cents END AS cents, o_year,
        |    CASE WHEN seg IS NULL AND k % 5 = 0 THEN 1
        |         ELSE version END AS version
        |  FROM base),
        |del AS (
        |  SELECT * FROM upd
        |  WHERE NOT coalesce(seg = 'F' AND k % 7 = 0, FALSE)),
        |batch_upd AS (
        |  SELECT k, seg, cents + 1 AS cents, o_year, 9 AS version
        |  FROM base WHERE seg IS NULL AND k % 11 = 0),
        |merged AS (
        |  SELECT d.* FROM del d
        |  WHERE NOT EXISTS (SELECT 1 FROM batch_upd b WHERE b.k = d.k)
        |  UNION ALL SELECT * FROM batch_upd
        |  UNION ALL SELECT k + 90000000, seg, cents, o_year, version
        |  FROM batch_upd)
        |SELECT coalesce(seg, '(null)') AS seg_g, o_year, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  TRUE AS null_part_ok
        |FROM merged GROUP BY 1, 2""".stripMargin,

    "q181_wap_branch" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, c_mktsegment AS segment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |upd AS (
        |  SELECT k, segment,
        |    CASE WHEN k % 10 = 0 THEN cents + 7 ELSE cents END AS cents
        |  FROM base),
        |kept AS (SELECT * FROM upd WHERE k % 17 <> 0),
        |final AS (SELECT * FROM kept
        |  UNION ALL SELECT 9000001 AS k, 'WAP' AS segment, 777 AS cents
        |  UNION ALL SELECT 9000003 AS k, 'LATE' AS segment, 1 AS cents
        |  UNION ALL SELECT 9000004 AS k, 'MAIN' AS segment, 2 AS cents)
        |SELECT segment, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS wap_ok
        |FROM final GROUP BY segment""".stripMargin,

    "q180_convert_adopt" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |kept AS (SELECT * FROM base WHERE k % 97 <> 0 AND k <> 42),
        |final AS (SELECT * FROM kept
        |          UNION ALL SELECT 9000001 AS k, 'X' AS status, 123 AS cents)
        |SELECT status, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  TRUE AS convert_ok
        |FROM final GROUP BY status""".stripMargin,

    "q179_array_struct_evolution" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |elems AS (
        |  SELECT status, cents AS n FROM base
        |  UNION ALL SELECT status, cents * 2 + 1 AS n FROM base
        |  UNION ALL SELECT 'Z' AS status, 5 AS n)
        |SELECT status, count(*) AS n_elems, CAST(sum(n) AS BIGINT) AS sum_n,
        |  TRUE AS evo_ok
        |FROM elems GROUP BY status""".stripMargin,

    "q178_identity_ddl" ->
      """WITH cust AS (
        |  SELECT c_custkey AS ck, c_mktsegment AS seg,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |w1 AS (SELECT seg, cents + 1 AS cents FROM cust WHERE ck % 10 = 0),
        |w2 AS (SELECT seg, cents + 2 AS cents FROM cust WHERE ck % 15 = 0),
        |sup AS (SELECT 'ZZZ' AS seg, 42 AS cents),
        |final AS (SELECT * FROM w1 UNION ALL SELECT * FROM sup
        |          UNION ALL SELECT * FROM w2)
        |SELECT seg, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  TRUE AS ddl_ok
        |FROM final GROUP BY seg""".stripMargin,

    "q174_histogram_cbo" ->
      """WITH fact AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    CASE WHEN o_orderkey % 10 <> 0 THEN 1
        |         ELSE (o_orderkey % 97) + 2 END AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |dim AS (
        |  SELECT n_nationkey + 50 AS k, n_name AS name FROM nation)
        |SELECT name, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS hist_ok
        |FROM fact JOIN dim USING (k)
        |GROUP BY name""".stripMargin,
    "q173_auto_optimize" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, c_mktsegment AS segment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |waves AS (
        |  SELECT k + w * 10000000 AS k, segment, cents + w AS cents
        |  FROM base, (SELECT UNNEST([1,2,3,4,5,6]) AS w)
        |  WHERE k % 31 = w % 31),
        |final AS (SELECT * FROM base UNION ALL SELECT * FROM waves)
        |SELECT segment, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS ao_ok
        |FROM final GROUP BY segment""".stripMargin,
    "q172_approx_distinct_mv" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |final AS (
        |  SELECT * FROM (
        |    SELECT k, status, cents, o_year FROM base
        |    UNION ALL
        |    SELECT k + 20000000, status, cents, o_year FROM base
        |    WHERE k % 13 = 0)
        |  WHERE o_year <> 1995)
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS adc_ok
        |FROM final GROUP BY status""".stripMargin,
    "q171_async_mv" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |final AS (
        |  SELECT k, status,
        |    CASE WHEN k % 7 = 0 THEN cents + 5 ELSE cents END AS cents,
        |    o_year
        |  FROM base WHERE k % 11 <> 0)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS amv_ok
        |FROM final GROUP BY 1, 2""".stripMargin,
    "q170_checkpoint_formats" ->
      """WITH base AS (
        |  SELECT s_suppkey AS k, s_nationkey AS nk,
        |         CAST(round(s_acctbal * 100) AS BIGINT) AS cents
        |  FROM supplier),
        |final AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT k + 8000000, nk, cents + 11 FROM base WHERE k % 7 = 0)
        |SELECT nk, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  TRUE AS ckpt_ok
        |FROM final GROUP BY nk""".stripMargin,
    "q169_nested_evolution" ->
      """WITH base AS (
        |  SELECT event_id AS k, event_type AS etype, value AS pts,
        |         CAST(regexp_extract(props, '[0-9]+') AS INT) AS pk
        |  FROM events),
        |final AS (
        |  SELECT k, etype, pts, pk, NULL AS src FROM base
        |  UNION ALL
        |  SELECT k + 1000000000, etype, pts + 1, pk, 'etl' FROM base
        |  WHERE k % 97 = 0)
        |SELECT etype, count(*) AS n, CAST(sum(pk) AS BIGINT) AS sum_pk,
        |  round(sum(pts), 2) AS sum_pts, count(src) AS n_src,
        |  TRUE AS nest_ok
        |FROM final GROUP BY etype""".stripMargin,
    "q168_metadata_count" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, c_mktsegment AS segment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |ins AS (
        |  SELECT k + 90000000 AS k, segment, bal_cents FROM base
        |  WHERE k % 97 = 0),
        |live AS (
        |  SELECT * FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)
        |  WHERE k % 10 <> 0)
        |SELECT count(*) AS n, 'total' AS which, TRUE AS mc_ok FROM live
        |UNION ALL
        |SELECT count(*) AS n, 'building' AS which, TRUE AS mc_ok
        |FROM live WHERE segment = 'BUILDING'
        |UNION ALL
        |SELECT count(*) AS n, 'all_match' AS which, TRUE AS mc_ok
        |FROM live WHERE k >= 1
        |UNION ALL
        |SELECT count(*) AS n, 'none_match' AS which, TRUE AS mc_ok
        |FROM live WHERE k < 0""".stripMargin,

    "q167_time_travel_ops" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |kept AS (
        |  SELECT * FROM base
        |  WHERE o_year <> 1995 OR k % 3 = 0)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS tt_ok
        |FROM kept GROUP BY o_year, status""".stripMargin,

    "q166_ndv_stats" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS ndv_ok
        |FROM base WHERE o_year <> 1998
        |GROUP BY o_year, status""".stripMargin,

    "q165_column_defaults" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |legacy AS (SELECT k, status, cents, o_year,
        |           CAST(NULL AS VARCHAR) AS src FROM base),
        |dflt AS (
        |  SELECT k + 50000000 AS k, status, cents, o_year, 'etl' AS src
        |  FROM base WHERE o_year = 1993 AND k % 41 = 0),
        |manual AS (
        |  SELECT k + 60000000 AS k, status, cents, o_year, 'manual' AS src
        |  FROM base WHERE o_year = 1993 AND k % 43 = 0),
        |allr AS (SELECT * FROM legacy UNION ALL SELECT * FROM dflt
        |         UNION ALL SELECT * FROM manual)
        |SELECT o_year, coalesce(src, 'legacy') AS src, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS dflt_ok
        |FROM allr GROUP BY 1, 2""".stripMargin,

    "q164_partition_evolution" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderdate AS odate, year(o_orderdate) AS o_year
        |  FROM orders),
        |ins AS (
        |  SELECT k + 50000000 AS k, status, cents, odate, o_year
        |  FROM base WHERE o_year = 1994 AND k % 61 = 0),
        |allr AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
        |kept AS (
        |  SELECT * FROM allr
        |  WHERE NOT (odate >= TIMESTAMP '1992-03-01'
        |         AND odate < TIMESTAMP '1992-04-01'))
        |SELECT strftime(odate, '%Y-%m') AS om, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS pevo_ok
        |FROM kept GROUP BY 1""".stripMargin,

    "q163_hour_partitioning" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hr,
        |  count(*) AS n, round(sum(value), 2) AS sum_value,
        |  TRUE AS hour_ok
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
        |GROUP BY date_trunc('hour', ts)""".stripMargin,

    "q162_merge_schema_evolution" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |upd AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1997 AND k % 13 = 0
        |         THEN cents + 1000 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1997 AND k % 13 = 0 THEN 'upd' END AS note
        |  FROM base),
        |ins AS (
        |  SELECT k + 90000000 AS k, status, cents, o_year, 'new' AS note
        |  FROM base WHERE o_year = 1996 AND k % 97 = 0),
        |final AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT o_year, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  count(note) AS n_note, TRUE AS mse_ok
        |FROM final GROUP BY o_year""".stripMargin,

    "q161_rename_table" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |upd AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1996 AND k % 9 = 0
        |         THEN cents + 3 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1996 AND k % 9 = 0
        |         THEN 1 ELSE version END AS version
        |  FROM base),
        |final AS (
        |  SELECT * FROM upd WHERE NOT (o_year = 1998 AND k % 4 = 0))
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version, TRUE AS rename_ok
        |FROM final GROUP BY o_year, status""".stripMargin,

    "q159_unpartitioned" ->
      """WITH base AS (
        |  SELECT c_custkey AS k, c_mktsegment AS segment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |after_del AS (SELECT * FROM base WHERE k % 10 <> 0),
        |after_upd AS (
        |  SELECT k, segment,
        |    CASE WHEN segment = 'BUILDING' THEN bal_cents + 100
        |         ELSE bal_cents END AS bal_cents
        |  FROM after_del),
        |final AS (
        |  SELECT * FROM after_upd
        |  UNION ALL
        |  SELECT * FROM (VALUES (9000001, 'SYNTH', 5), (9000002, 'SYNTH', 7))
        |    AS v(k, segment, bal_cents))
        |SELECT segment, count(*) AS n,
        |  CAST(sum(bal_cents) AS BIGINT) AS sum_bal, TRUE AS unpart_ok
        |FROM final GROUP BY segment""".stripMargin,

    "q160_bucket_pruning" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS status,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  TRUE AS bucket_ok
        |FROM orders WHERE o_orderkey IN (1, 32775, 59998)
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS k, 'R' AS status,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents, TRUE AS bucket_ok
        |FROM orders WHERE o_orderkey < 1000""".stripMargin,

    "q158_column_mapping" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |cur AS (
        |  SELECT o_year,
        |    CASE WHEN o_year = 1997 AND k % 11 = 0
        |         THEN cents + 5 ELSE cents END AS amount,
        |    CASE WHEN o_year = 1997 AND k % 11 = 0
        |         THEN 1 ELSE version END AS version
        |  FROM base)
        |SELECT o_year, count(*) AS n,
        |  CAST(sum(amount) AS BIGINT) AS sum_amount,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  'current' AS side, TRUE AS map_ok
        |FROM cur GROUP BY 1
        |UNION ALL
        |SELECT o_year, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_amount,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  'v0' AS side, TRUE AS map_ok
        |FROM base GROUP BY 1""".stripMargin,
    "q53_partitioned_roundtrip" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  count(*) AS cnt, round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-21'
        |GROUP BY 1""".stripMargin,

    "q71_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS users,
        |  CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q72_jsonl_roundtrip" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(text)) AS distinct_texts
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q100_orc_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT md5(text)) AS distinct_texts
        |FROM documents GROUP BY 1""".stripMargin,

    // Full-chain restatement: q44's scoring/filter/dedup, q57's split
    // buckets, then the train-only accounting — derived from the RAW
    // table, so the engine's write→pruned-read cycle is covered too.
    "q76_corpus_export" ->
      s"""WITH d AS (
        |  SELECT doc_id, source, text,
        |    string_split_regex(trim(lower(text)), '\\s+') AS ws,
        |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_tokens,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
        |      x -> x IN ('the','a','and','of','to','in','is','it','for','on'))) AS en_hits,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
        |      x -> x IN ('der','die','das','und','in','den','von','zu','mit','ist'))) AS de_hits,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
        |      x -> x IN ('el','la','de','que','y','en','un','es','por','con'))) AS es_hits
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, source, ws, n_tokens,
        |    ${ScaleQueries.qMuSql} AS q_mu,
        |    CASE WHEN greatest(de_hits, en_hits, es_hits) = 0 THEN 'und'
        |         WHEN en_hits > de_hits THEN (CASE WHEN es_hits > en_hits THEN 'es' ELSE 'en' END)
        |         ELSE (CASE WHEN es_hits > de_hits THEN 'es' ELSE 'de' END) END AS lang_guess
        |  FROM d),
        |f AS (SELECT * FROM scored WHERE q_mu >= 750000 AND lang_guess = 'en'),
        |k AS (
        |  SELECT *, row_number() OVER (PARTITION BY md5(array_to_string(ws, ' '))
        |                              ORDER BY doc_id) AS rn
        |  FROM f),
        |sp AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |  FROM k WHERE rn = 1)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM sp WHERE b < 90
        |GROUP BY source""".stripMargin,

    // Full restatement of the merge: base ∪ (updates, tombstones,
    // inserts) → row_number argmax per key on version → drop keys whose
    // winner is a tombstone → the same aggregate the engine computes from
    // the persisted table, plus the touched-partition count.
    "q108_partitioned_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, o_year,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year IN (1997, 1999)),
        |del AS (
        |  SELECT k, status, cents, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year IN (1997, 1999)),
        |ins AS (
        |  SELECT k + 10000000 AS k, 'N' AS status, cents // 2 AS cents,
        |         o_year, 1 AS version, 'U' AS op
        |  FROM base WHERE k % 11 = 0 AND o_year IN (1997, 1999)),
        |changes AS (
        |  SELECT * FROM upd UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  (SELECT count(DISTINCT o_year) FROM changes) AS parts_touched
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    "q109_scd2_history" ->
      """WITH feed AS (
        |  SELECT user_id, ts, min(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |marked AS (
        |  SELECT user_id, ts, etype,
        |    lag(etype) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM feed),
        |changed AS (
        |  SELECT user_id, ts, etype FROM marked
        |  WHERE prev IS NULL OR prev <> etype),
        |iv AS (
        |  SELECT etype, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM changed)
        |SELECT etype, count(*) AS n_intervals,
        |  count(*) FILTER (WHERE valid_to IS NULL) AS n_current,
        |  CAST(coalesce(sum(epoch_us(valid_to) - epoch_us(valid_from)), 0) AS BIGINT)
        |    AS sum_dur_us
        |FROM iv GROUP BY 1""".stripMargin,

    // The batch rebuild over the FULL feed — identical to q109's oracle
    // on purpose: the engine side runs the incremental apply, so hash
    // equality IS the incremental ≡ batch proof.
    "q110_scd2_incremental" ->
      """WITH feed AS (
        |  SELECT user_id, ts, min(event_type) AS etype
        |  FROM events GROUP BY 1, 2),
        |marked AS (
        |  SELECT user_id, ts, etype,
        |    lag(etype) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM feed),
        |changed AS (
        |  SELECT user_id, ts, etype FROM marked
        |  WHERE prev IS NULL OR prev <> etype),
        |iv AS (
        |  SELECT etype, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM changed)
        |SELECT etype, count(*) AS n_intervals,
        |  count(*) FILTER (WHERE valid_to IS NULL) AS n_current,
        |  CAST(coalesce(sum(epoch_us(valid_to) - epoch_us(valid_from)), 0) AS BIGINT)
        |    AS sum_dur_us
        |FROM iv GROUP BY 1""".stripMargin,

    // Totals restated from the source; the invariant bits pinned TRUE —
    // the engine computes them from the actual file manifest, so a
    // boundary overlap, a dropped row, or a file count outside
    // 1..numFiles flips a bit and goes hash-red. (The count is a range,
    // not a literal: a range partition that samples empty writes no file,
    // which is correct behavior, not an error.)
    "q111_range_sorted_export" ->
      """SELECT TRUE AS files_ok, count(*) AS n_rows, TRUE AS disjoint,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_key
        |FROM documents""".stripMargin,

    // The drift restated: priority exists only after 1997, qty is the
    // same derivation in both epochs (the widening changes no value).
    "q114_schema_evolution" ->
      """SELECT year(o_orderdate) AS o_year, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  count(CASE WHEN year(o_orderdate) > 1997 THEN o_orderpriority END)
        |    AS n_priority,
        |  CAST(sum(o_orderkey % 50 + 1) AS BIGINT) AS sum_qty
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // Totals restated with the SAME term-by-term interleave emitter the
    // engine plans from — one drifted bit position on either side moves
    // sum_z and goes hash-red.
    "q116_zorder_layout" ->
      s"""SELECT TRUE AS files_ok, count(*) AS n_rows, TRUE AS disjoint,
         |  CAST(sum(${graft.functions.ZOrder.interleaveSql("(user_id % 64)", "day(ts)", 8)}) AS BIGINT)
         |    AS sum_z
         |FROM events""".stripMargin,

    // q106/q107's contract on the q119 subset — the DSv2 path must
    // deliver the same bytes the source table holds.
    "q119_shard_dsv2" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents WHERE doc_id % 10 = 7""".stripMargin,

    // The same id set the engine pushes as an IN predicate on entry
    // names, restated straight from the source table.
    "q123_shard_pushdown_lookup" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents
        |WHERE doc_id % 10 = 7 AND doc_id BETWEEN 0 AND 97""".stripMargin,

    // q108's merge restatement with the final commit version pinned.
    "q125_logtable_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, o_year,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year IN (1997, 1999)),
        |del AS (
        |  SELECT k, status, cents, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year IN (1997, 1999)),
        |ins AS (
        |  SELECT k + 10000000 AS k, 'N' AS status, cents // 2 AS cents,
        |         o_year, 1 AS version, 'U' AS op
        |  FROM base WHERE k % 11 = 0 AND o_year IN (1997, 1999)),
        |changes AS (
        |  SELECT * FROM upd UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  2 AS log_version
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    // The merged 1997 state under the same date-range predicate, straight
    // from the raw table; files_skipped pinned TRUE.
    "q129_logtable_skipping" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderdate AS odate, year(o_orderdate) AS o_year,
        |         0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, odate, o_year,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year = 1997),
        |del AS (
        |  SELECT k, status, cents, odate, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year = 1997),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS files_skipped
        |FROM final
        |WHERE odate BETWEEN DATE '1997-03-01' AND DATE '1997-09-30'
        |GROUP BY 1""".stripMargin,

    // The survivors of the predicate delete, restated as WHERE NOT(pred)
    // over raw orders; delete_ok (one commit, spared>0, rewrote>0)
    // pinned TRUE.
    "q136_logtable_delete" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders)
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS delete_ok
        |FROM base
        |WHERE NOT (o_year = 1997 AND cents < 15000000)
        |GROUP BY 1""".stripMargin,

    // The predicate update restated as CASE WHEN over raw orders;
    // update_ok (one commit, spared>0, rewrote>0) pinned TRUE.
    "q137_logtable_update" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders)
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(CASE WHEN o_year = 1997 AND status = 'F'
        |                THEN (cents * 110) // 100 ELSE cents END)
        |       AS BIGINT) AS sum_cents,
        |  CAST(sum(CASE WHEN o_year = 1997 AND status = 'F'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS sum_version,
        |  TRUE AS update_ok
        |FROM base
        |GROUP BY 1""".stripMargin,

    // The survivors of BOTH vector deletes, restated as negated
    // predicates over raw orders; dv_ok pinned TRUE.
    "q138_logtable_dv_delete" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders)
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS dv_ok
        |FROM base
        |WHERE NOT (o_year = 1997 AND cents < 15000000)
        |  AND NOT (o_year = 1997 AND cents >= 40000000)
        |GROUP BY 1""".stripMargin,

    // q137's CASE restatement — the DV write strategy must meet the
    // rewrite strategy at the same answer; update_dv_ok pinned TRUE.
    "q139_logtable_dv_update" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders)
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(CASE WHEN o_year = 1997 AND status = 'F'
        |                THEN (cents * 110) // 100 ELSE cents END)
        |       AS BIGINT) AS sum_cents,
        |  CAST(sum(CASE WHEN o_year = 1997 AND status = 'F'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS sum_version,
        |  TRUE AS update_dv_ok
        |FROM base
        |GROUP BY 1""".stripMargin,

    // After restore(1), the table IS raw orders again — the oracle
    // applies neither the merge nor the delete; restore_ok pinned TRUE.
    "q140_logtable_restore" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders)
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS restore_ok
        |FROM base
        |GROUP BY 1""".stripMargin,

    // The 2-D box straight off raw orders; both prune bits folded into
    // zorder_ok pinned TRUE.
    "q146_logtable_zorder" ->
      """WITH base AS (
        |  SELECT o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderdate AS odate
        |  FROM orders)
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS zorder_ok
        |FROM base
        |WHERE odate BETWEEN DATE '1997-04-01' AND DATE '1997-06-30'
        |  AND cents >= 30000000
        |GROUP BY 1""".stripMargin,

    // Full recompute of the view over the merged-from-scratch final
    // state — the incremental path must land on EXACTLY this; mv_ok
    // (spared buckets, -1 re-refresh, watermark at head) pinned TRUE.
    "q147_materialized_view" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
        |         0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, o_year, o_month,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year = 1997 AND o_month = 6),
        |del AS (
        |  SELECT k, status, cents, o_year, o_month, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year = 1997 AND o_month = 6),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del)),
        |final AS (
        |  SELECT *, CASE WHEN cents % 3 = 0 THEN cents END AS bonus
        |  FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT o_year, o_month, status, count(*) AS n, count(bonus) AS n_bonus,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  round(CAST(sum(bonus) AS DOUBLE) / count(bonus), 4) AS avg_bonus,
        |  TRUE AS mv_ok
        |FROM final
        |GROUP BY 1, 2, 3""".stripMargin,

    // Full recompute of min/max/count/sum over the final state (base
    // minus each 1997 group's minimum row, plus the 1998 insert wave) —
    // a min the rescan failed to repair hash-reds; mv_ok pinned TRUE.
    "q149_mv_minmax" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |mins AS (
        |  SELECT k FROM (
        |    SELECT k, row_number() OVER (
        |      PARTITION BY o_year, status ORDER BY cents, k) AS rn
        |    FROM base WHERE o_year = 1997) WHERE rn = 1),
        |kept AS (SELECT * FROM base WHERE k NOT IN (SELECT k FROM mins)),
        |ins AS (
        |  SELECT k + 30000000 AS k, status, cents + 1000000000 AS cents,
        |         o_year
        |  FROM base WHERE o_year = 1998 AND k % 97 = 0),
        |final AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS mv_ok
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    // The one-statement snapshot sync restated: 1997 becomes exactly the
    // source (departed k%13 gone, matched rows repriced and versioned,
    // k%11 clones inserted), every other year untouched; sync_ok TRUE.
    "q150_merge_by_source" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |src AS (
        |  SELECT k, status,
        |    CASE WHEN k % 7 = 0 THEN (cents * 110) // 100 ELSE cents END AS cents,
        |    o_year, 1 AS version
        |  FROM base WHERE o_year = 1997 AND k % 13 <> 0
        |  UNION ALL
        |  SELECT k + 10000000 AS k, status, cents + 7 AS cents, o_year,
        |         1 AS version
        |  FROM base WHERE o_year = 1997 AND k % 11 = 0),
        |final AS (
        |  SELECT k, status, cents, o_year, version FROM base
        |  WHERE o_year <> 1997
        |  UNION ALL SELECT * FROM src)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version, TRUE AS sync_ok
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    // The SQL-defined view recomputed from scratch over the restated
    // base (k%13 deleted in 1997, k%7 repriced); mv_sql_ok pinned TRUE.
    "q154_mv_sql" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |kept AS (
        |  SELECT * FROM base WHERE NOT (o_year = 1997 AND k % 13 = 0)),
        |u AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0
        |         THEN (cents * 110) // 100 ELSE cents END AS cents, o_year
        |  FROM kept)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents, TRUE AS mv_sql_ok
        |FROM u
        |GROUP BY 1, 2""".stripMargin,

    // The widened final state recomputed with 64-bit arithmetic from
    // raw orders; widen_ok (loud-without-mergeSchema, LONG schema,
    // spared files, stats pruning) pinned TRUE.
    "q153_type_widening" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |u AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0
        |         THEN cents + 10000000000 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0 THEN 1 ELSE 0 END AS version
        |  FROM base)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version, TRUE AS widen_ok
        |FROM u
        |GROUP BY 1, 2""".stripMargin,

    // Only the UPDATE is row-visible — constraint add/drop, the caught
    // violating insert, OPTIMIZE and VACUUM must all leave rows alone;
    // lifecycle_ok pins the enforcement, the floor, and the ledger.
    "q156_generated_partitions" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderdate AS odate, year(o_orderdate) AS o_year
        |  FROM orders),
        |ins AS (
        |  SELECT k + 30000000 AS k, cents, odate, o_year
        |  FROM base WHERE o_year = 1992 AND k % 97 = 0),
        |final AS (SELECT * FROM base UNION ALL SELECT * FROM ins)
        |SELECT CAST(year(odate) AS INT) AS odate_year, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS gen_ok
        |FROM final GROUP BY 1""".stripMargin,

    "q157_shallow_clone" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |srcf AS (SELECT * FROM base WHERE NOT (o_year = 1996 AND k % 5 = 0)),
        |clonef AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0
        |         THEN (cents * 110) // 100 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0 THEN 1 ELSE version END AS version
        |  FROM base)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  'src' AS side, TRUE AS clone_ok
        |FROM srcf GROUP BY 1, 2
        |UNION ALL
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  'clone' AS side, TRUE AS clone_ok
        |FROM clonef GROUP BY 1, 2""".stripMargin,

    "q155_named_catalog" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |d1 AS (SELECT * FROM base WHERE NOT (o_year = 1996 AND k % 5 = 0)),
        |u1 AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0
        |         THEN (cents * 110) // 100 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0 THEN 1 ELSE version END AS version
        |  FROM d1),
        |m1 AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1998 AND k % 7 = 0 AND k % 13 <> 0
        |         THEN cents + 1111 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1998 AND k % 7 = 0 AND k % 13 <> 0
        |         THEN 2 ELSE version END AS version
        |  FROM u1
        |  WHERE NOT (o_year = 1998 AND k % 13 = 0)),
        |mi AS (
        |  SELECT k + 10000000 AS k, status, cents + 5 AS cents, o_year,
        |         3 AS version
        |  FROM base WHERE o_year = 1998 AND k % 11 = 0),
        |ai AS (
        |  SELECT k + 20000000 AS k, status, cents * 2 AS cents, o_year,
        |         4 AS version
        |  FROM base WHERE o_year = 1999 AND k % 50 = 0),
        |final AS (SELECT * FROM m1 UNION ALL SELECT * FROM mi
        |          UNION ALL SELECT * FROM ai)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version, TRUE AS named_ok
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    "q151_sql_lifecycle" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |u AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1997 AND k % 10 = 0 THEN cents + 1
        |         ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1997 AND k % 10 = 0 THEN 1 ELSE 0 END AS version
        |  FROM base)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version, TRUE AS lifecycle_ok
        |FROM u
        |GROUP BY 1, 2""".stripMargin,

    // The four SQL DML statements restated as a WITH-chain over raw
    // orders: delete 1992/k%5, +10% update 1993/k%7, the 1994 merge
    // (conditional delete k%13 / update k%7 / insert k%11 under shifted
    // keys), then the 1995/k%50 doubled-cents append; sql_ok (time
    // travel count + one commit per operation kind) pinned TRUE.
    "q148_sql_surface" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |d1 AS (SELECT * FROM base WHERE NOT (o_year = 1996 AND k % 5 = 0)),
        |u1 AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0
        |         THEN (cents * 110) // 100 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1997 AND k % 7 = 0 THEN 1 ELSE version END AS version
        |  FROM d1),
        |m1 AS (
        |  SELECT k, status,
        |    CASE WHEN o_year = 1998 AND k % 7 = 0 AND k % 13 <> 0
        |         THEN cents + 1111 ELSE cents END AS cents,
        |    o_year,
        |    CASE WHEN o_year = 1998 AND k % 7 = 0 AND k % 13 <> 0
        |         THEN 2 ELSE version END AS version
        |  FROM u1
        |  WHERE NOT (o_year = 1998 AND k % 13 = 0)),
        |mi AS (
        |  SELECT k + 10000000 AS k, status, cents + 5 AS cents, o_year,
        |         3 AS version
        |  FROM base WHERE o_year = 1998 AND k % 11 = 0),
        |ai AS (
        |  SELECT k + 20000000 AS k, status, cents * 2 AS cents, o_year,
        |         4 AS version
        |  FROM base WHERE o_year = 1999 AND k % 50 = 0),
        |final AS (SELECT * FROM m1 UNION ALL SELECT * FROM mi
        |          UNION ALL SELECT * FROM ai)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version, TRUE AS sql_ok
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    // The VALID merge's state only — the violating batch never lands;
    // constraint_ok pinned TRUE.
    "q145_logtable_constraint" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, o_year,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year = 1997),
        |del AS (
        |  SELECT k, status, cents, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year = 1997),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  TRUE AS constraint_ok
        |FROM final
        |GROUP BY 1""".stripMargin,

    // The three net-change sets derived from raw orders: tombstoned keys
    // (the version-2 'D' wins even over an update), updated keys' pre
    // and post images; riders appear in NO set.
    "q142_logtable_net_changes" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year
        |  FROM orders),
        |chg AS (
        |  SELECT 'delete' AS _change_type, status, cents
        |  FROM base WHERE k % 13 = 0 AND o_year IN (1997, 1999)
        |  UNION ALL
        |  SELECT 'update_preimage', status, cents
        |  FROM base WHERE k % 7 = 0 AND k % 13 <> 0 AND o_year IN (1997, 1999)
        |  UNION ALL
        |  SELECT 'update_postimage', status, (cents * 110) // 100
        |  FROM base WHERE k % 7 = 0 AND k % 13 <> 0 AND o_year IN (1997, 1999))
        |SELECT _change_type, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM chg
        |GROUP BY 1, 2""".stripMargin,

    // The literal expected ledger: seven operations, purge and
    // compaction as dataChange=false rearrangements.
    "q143_logtable_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'CREATE', TRUE),
        |  (CAST(2 AS BIGINT), 'MERGE', TRUE),
        |  (CAST(3 AS BIGINT), 'DELETE', TRUE),
        |  (CAST(4 AS BIGINT), 'PURGE', FALSE),
        |  (CAST(5 AS BIGINT), 'RESTORE', TRUE),
        |  (CAST(6 AS BIGINT), 'MERGE_INTO', TRUE),
        |  (CAST(7 AS BIGINT), 'COMPACT', FALSE))
        |  AS t(version, operation, data_change)""".stripMargin,

    // The merge clauses restated relationally: survivors via LEFT JOIN +
    // CASE (delete-marked rows excluded), inserts via anti-join;
    // merge_version pinned.
    "q141_logtable_merge_into" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version
        |  FROM orders),
        |src AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, o_year, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year IN (1997, 1999)
        |  UNION ALL
        |  SELECT k, status, cents, o_year, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND k % 7 <> 0 AND o_year IN (1997, 1999)
        |  UNION ALL
        |  SELECT k + 10000000 AS k, 'N' AS status, cents // 2 AS cents,
        |         o_year, 'U' AS op
        |  FROM base WHERE k % 11 = 0 AND o_year IN (1997, 1999)),
        |kept AS (
        |  SELECT t.o_year, t.status,
        |         CASE WHEN s.k IS NOT NULL AND s.op <> 'D' AND s.cents > t.cents
        |              THEN s.cents ELSE t.cents END AS cents,
        |         CASE WHEN s.k IS NOT NULL AND s.op <> 'D' AND s.cents > t.cents
        |              THEN t.version + 1 ELSE t.version END AS version
        |  FROM base t LEFT JOIN src s ON t.k = s.k
        |  WHERE s.k IS NULL OR s.op <> 'D'),
        |inserted AS (
        |  SELECT s.o_year, s.status, s.cents, 0 AS version
        |  FROM src s LEFT JOIN base t ON s.k = t.k
        |  WHERE t.k IS NULL),
        |final AS (SELECT * FROM kept UNION ALL SELECT * FROM inserted)
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(version) AS BIGINT) AS sum_version,
        |  2 AS merge_version
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    // q129's restatement through the table() read path: same merged
    // state, same predicate; the scan-metric and route bits pinned TRUE.
    "q133_logtable_table" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderdate AS odate, year(o_orderdate) AS o_year,
        |         0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, odate, o_year,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year = 1997),
        |del AS (
        |  SELECT k, status, cents, odate, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year = 1997),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents, TRUE AS files_skipped,
        |  TRUE AS via_table_api
        |FROM final
        |WHERE odate BETWEEN DATE '1997-03-01' AND DATE '1997-09-30'
        |GROUP BY 1""".stripMargin,

    // The merged 1997 count restated; both proof-class bits pinned TRUE.
    "q134_logtable_count" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, (cents * 110) // 100 AS cents, o_year, 1 AS version,
        |         'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year = 1997),
        |del AS (
        |  SELECT k, cents, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year = 1997),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT count(*) AS n, TRUE AS decided_some, TRUE AS excluded_some
        |FROM final WHERE o_year = 1997 AND cents >= 0""".stripMargin,

    // The version-3 state restated (the reconstruction must equal it);
    // the CDF identity bit pinned TRUE and the window pinned (1, 3).
    "q130_logtable_changes" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, o_year,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year IN (1997, 1999)),
        |del AS (
        |  SELECT k, status, cents, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year IN (1997, 1999)),
        |ins AS (
        |  SELECT k + 10000000 AS k, 'N' AS status, cents // 2 AS cents,
        |         o_year, 1 AS version, 'U' AS op
        |  FROM base WHERE k % 11 = 0 AND o_year IN (1997, 1999)),
        |upd3 AS (
        |  SELECT k, status, cents // 3 AS cents, o_year, 3 AS version, 'U' AS op
        |  FROM base WHERE k % 5 = 0 AND o_year = 1996),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins
        |        UNION ALL SELECT * FROM upd3)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  TRUE AS cdf_consistent, 1 AS from_version, 3 AS to_version
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    // The (1997, 'O')-touching merge restated; the partition-column count
    // and final version pinned.
    "q131_logtable_multipart" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         year(o_orderdate) AS o_year, 0 AS version, 'U' AS op
        |  FROM orders),
        |upd AS (
        |  SELECT k, status, (cents * 110) // 100 AS cents, o_year,
        |         1 AS version, 'U' AS op
        |  FROM base WHERE k % 7 = 0 AND o_year = 1997 AND status = 'O'),
        |del AS (
        |  SELECT k, status, cents, o_year, 2 AS version, 'D' AS op
        |  FROM base WHERE k % 13 = 0 AND o_year = 1997 AND status = 'O'),
        |w AS (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM upd
        |        UNION ALL SELECT * FROM del)),
        |final AS (SELECT * FROM w WHERE rn = 1 AND op <> 'D')
        |SELECT o_year, status AS o_orderstatus, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  2 AS log_version, 2 AS n_partition_cols
        |FROM final
        |GROUP BY 1, 2""".stripMargin,

    // The drift restated from the raw table: priority counts exist only
    // after 1997 (the old epoch's files read the evolved column as NULL).
    "q128_logtable_evolution" ->
      """SELECT year(o_orderdate) AS o_year, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  count(CASE WHEN year(o_orderdate) > 1997 THEN o_orderpriority END)
        |    AS n_priority
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // The pre-merge state straight from the raw table: time travel to
    // version 1 must reproduce it bit for bit.
    "q126_logtable_timetravel" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  1 AS version_read
        |FROM orders
        |GROUP BY 1, 2""".stripMargin,

    "q68_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
}
