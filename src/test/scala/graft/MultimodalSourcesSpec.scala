package graft

import graft.ops.{Multimodal, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal binary plumbing + CSV/JSON/partitioned-sink round trips
  * (SURVEY.md §2.10 multimodal_binary, §2.1 scalatest rows).
  */
class MultimodalSourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synth(spark, 300)

  test("multimodal: per-mime stats over opaque payloads") {
    val stats = Multimodal.perMimeStats(media.toDF()).collect()
    assert(stats.length == 3)
    assert(stats.forall(_.getAs[Long]("n_items") == 100L))
    assert(stats.forall(r => r.getAs[Long]("min_bytes") >= 16 && r.getAs[Long]("max_bytes") <= 4096))
  }

  test("multimodal: size histogram buckets partition the corpus") {
    val hist = Multimodal.sizeHistogram(media.toDF(), 1024)
    assert(hist.agg(sum("n")).collect()(0).getLong(0) == 300L)
  }

  test("multimodal: batched decode stub — schema, batch shape, determinism") {
    val decoded = Multimodal.decodeFeatures(media, dim = 8)
    assert(decoded.schema.fieldNames.toSeq == Seq("id", "mime", "n_bytes", "feature"))
    val rows = decoded.collect()
    assert(rows.length == 300)
    assert(rows.forall(_.feature.length == 8))
    // deterministic fake kernel: same input -> same features on a re-run
    val again = Multimodal.decodeFeatures(media, dim = 8).collect()
    assert(rows.sortBy(_.id).zip(again.sortBy(_.id)).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("multimodal: frame sampling explodes every nth index") {
    val df = Seq((1L, 10), (2L, 3)).toDF("id", "n_frames")
    val frames = Multimodal.sampleFrames(df, "n_frames", every = 3).collect()
    assert(frames.count(_.getLong(0) == 1L) == 4) // 0,3,6,9
    assert(frames.count(_.getLong(0) == 2L) == 1) // 0
  }

  test("multimodal: partitioned-by-mime sink round-trips") {
    val out = Multimodal.writeByMime(media.toDF(), tmpDir("mime-sink"))
    assert(out.count() == 300)
    assert(out.select("mime").distinct().count() == 3)
  }

  test("CSV: explicit schema + header round trip, inference agrees") {
    val path = tmpDir("csv") + "/t.csv"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\n3,gamma,\n",
    )
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType), StructField("score", DoubleType)))
    val typed = Sources.readCsv(spark, path, schema)
    assert(typed.count() == 3)
    assert(typed.filter(col("score").isNull).count() == 1)
    val inferred = Sources.readCsvInferred(spark, path)
    assert(inferred.schema("id").dataType.typeName.startsWith("int"))
    assert(inferred.schema("score").dataType.typeName == "double")
  }

  test("JSON lines: nested struct inference") {
    val path = tmpDir("json") + "/t.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path),
      """{"id":1,"meta":{"k":7,"tags":["a","b"]}}""" + "\n" + """{"id":2,"meta":{"k":9,"tags":[]}}""" + "\n",
    )
    val df = Sources.readJson(spark, path)
    assert(df.count() == 2)
    assert(df.select(col("meta.k")).as[Long].collect().sorted.sameElements(Array(7L, 9L)))
  }

  test("partitioned parquet sink: round trip + partition pruning") {
    val src = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val path = tmpDir("part-sink")
    val back = Sources.writePartitioned(src, path, Seq("o_orderstatus"))
    assert(back.count() == src.count())
    // pruned read touches only one partition directory
    val pruned = back.filter(col("o_orderstatus") === "F")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(pruned.count() == src.filter(col("o_orderstatus") === "F").count())
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("o_orderstatus=")))
  }

  test("schema evolution: mergeSchema unions shard schemas, reconcile backfills") {
    val v1Path = tmpDir("shard-v1")
    val v2Path = tmpDir("shard-v2")
    val docs = Tables.documents(spark, sfDir)
    // v1 shard predates the lang column; v2 carries it
    docs.filter(col("doc_id") < 100).select("doc_id", "text").write.mode("overwrite").parquet(v1Path)
    docs.filter(col("doc_id") >= 100).select("doc_id", "text", "lang").write.mode("overwrite").parquet(v2Path)
    val merged = Sources.readMergedSchema(spark, Seq(v1Path, v2Path))
    assert(merged.columns.toSet == Set("doc_id", "text", "lang"))
    assert(merged.count() == docs.count())
    // old-shard rows surface the evolved column as null…
    assert(merged.filter(col("doc_id") < 100 && col("lang").isNull).count() == 100)
    // …and reconcile backfills them with the declared default, touching
    // nothing else
    val fixed = Sources.reconcile(merged, Map("lang" -> "und"))
    assert(fixed.filter(col("lang").isNull).count() == 0)
    assert(fixed.filter(col("doc_id") < 100 && col("lang") === "und").count() == 100)
    assert(
      fixed.filter(col("doc_id") >= 100).select("doc_id", "lang").orderBy("doc_id").collect().toSeq ==
        docs.filter(col("doc_id") >= 100).select("doc_id", "lang").orderBy("doc_id").collect().toSeq
    )
  }

  test("range layout: files cover disjoint key ranges and the filter still pushes down") {
    val path = tmpDir("range-layout")
    val src = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice")
    Sources.writeRangeLayout(src, path, "l_orderkey", numFiles = 8)
    val files = new java.io.File(path)
      .listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
    assert(files.length > 1, "range layout should produce multiple files")
    // per-file key ranges must be pairwise disjoint — this is exactly what
    // lets parquet row-group stats skip files for any l_orderkey predicate
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("l_orderkey"), max("l_orderkey")).first()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $aMax > $bMin")
      case _ => ()
    }
    // round trip is lossless and the range predicate reaches the scan
    val back = spark.read.parquet(path)
    assert(back.count() == src.count())
    val filtered = back.filter(col("l_orderkey") < 100)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("LessThan(l_orderkey"), scan.take(500))
    assert(filtered.count() == src.filter(col("l_orderkey") < 100).count())
  }

  test("z-order layout: per-file bounding boxes compact in BOTH dims, unlike single-column sort") {
    val src = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_quantity")

    def avgSpans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length > 4, s"expected a multi-file layout, got ${files.length}")
      val spans = files.map { f =>
        val r = spark.read
          .parquet(f.getAbsolutePath)
          .agg(min("l_orderkey"), max("l_orderkey"), min("l_partkey"), max("l_partkey"))
          .first()
        ((r.getLong(1) - r.getLong(0)).toDouble, (r.getLong(3) - r.getLong(2)).toDouble)
      }
      val g = src.agg(
        max("l_orderkey") - min("l_orderkey"),
        max("l_partkey") - min("l_partkey"),
      ).first()
      (
        spans.map(_._1).sum / spans.length / g.getLong(0),
        spans.map(_._2).sum / spans.length / g.getLong(1),
      )
    }

    val zPath = tmpDir("zorder")
    Sources.writeZOrder(src, zPath, "l_orderkey", "l_partkey", numFiles = 16)
    assert(spark.read.parquet(zPath).count() == src.count(), "z-order write must be lossless")
    val (za, zb) = avgSpans(zPath)
    // every file's rectangle is a fraction of the (orderkey, partkey) domain
    // in BOTH dimensions — the property that lets min/max stats prune scans
    // filtered on either column
    assert(za < 0.7, s"z-order left l_orderkey spans at $za of the domain")
    assert(zb < 0.7, s"z-order left l_partkey spans at $zb of the domain")

    // contrast: a single-column range layout keeps the sorted column tight
    // but scatters the other across ~the full domain in every file
    val naivePath = tmpDir("naive-range")
    Sources.writeRangeLayout(src, naivePath, "l_orderkey", numFiles = 16)
    val (na, nb) = avgSpans(naivePath)
    assert(na < 0.2, s"range layout should keep the sort column tight, got $na")
    assert(nb > 0.8, s"expected the unsorted dim to scatter, got $nb")
  }

  test("compaction: fragmented directory rewrites to size-balanced files, content preserved") {
    val src = Tables.events(spark, sfDir).select("event_id", "user_id", "event_type")
    val fragDir = tmpDir("frag")
    src.repartition(64).write.mode("overwrite").parquet(fragDir) // 64 tiny files
    val fragCount = new java.io.File(fragDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(fragCount >= 32, s"fixture not fragmented enough: $fragCount files")
    val outDir = tmpDir("compact")
    val n = src.count()
    val target = 300L
    val back = Sources.compactFiles(spark, fragDir, outDir, target)
    val outFiles = new java.io.File(outDir).listFiles().count(_.getName.endsWith(".parquet"))
    val expect = ((n + target - 1) / target).toInt
    assert(outFiles == expect, s"expected $expect compacted files, got $outFiles")
    // hard cap holds per file, and no row was lost or duplicated
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("rows"))
      .collect()
    assert(perFile.forall(_.getAs[Long]("rows") <= target), "a file exceeds maxRecordsPerFile")
    assert(back.count() == n)
    assert(
      back.select("event_id").except(src.select("event_id")).isEmpty &&
        src.select("event_id").except(back.select("event_id")).isEmpty,
      "compaction changed the row set",
    )
  }

  test("binaryFile source: real on-disk bytes round-trip with length and extension") {
    val dir = tmpDir("binsrc")
    val payloads = Map(
      "a.jpg" -> Array.tabulate(512)(i => (i % 251).toByte),
      "b.wav" -> Array.tabulate(1024)(i => ((i * 7) % 256 - 128).toByte),
      "c.mp4" -> Array.tabulate(64)(i => (255 - i).toByte),
    )
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    val df = Sources.readBinaryFiles(spark, dir)
    val rows = df.collect().map(r => r.getAs[String]("path").split("/").last -> r).toMap
    assert(rows.keySet == payloads.keySet)
    payloads.foreach { case (name, bytes) =>
      val r = rows(name)
      assert(r.getAs[Long]("length") == bytes.length.toLong)
      assert(r.getAs[String]("ext") == name.split("\\.").last)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("content"), bytes), s"bytes differ: $name")
    }
    // glob filter prunes at the listing, and the frame feeds the multimodal
    // stats shape (mime-from-ext ≡ Multimodal's mime column convention)
    assert(Sources.readBinaryFiles(spark, dir, "*.jpg").count() == 1)
    val stats = df.groupBy("ext").agg(count(lit(1)).as("n"), sum("length").as("bytes")).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 3L)
  }

  test("ORC: round trip preserves data and pushes filters to the scan") {
    val src = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val path = tmpDir("orc-sink")
    Sources.writeOrc(src, path)
    val back = Sources.readOrc(spark, path)
    assert(back.orderBy("o_orderkey").collect().toSeq == src.orderBy("o_orderkey").collect().toSeq)
    val filtered = back.filter(col("o_totalprice") > 100000.0)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("Orc") || scan.contains("orc"), scan.take(300))
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(o_totalprice"), scan.take(500))
    assert(filtered.count() == src.filter(col("o_totalprice") > 100000.0).count())
  }
}
