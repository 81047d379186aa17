package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based cross-format CONVERT fuzz: a seeded op soup (append, DV
  * / position delete, copy-on-write or merge-on-read update, keyed
  * merge) runs against a live table while a driver model tracks the
  * exact (id → v) contents; at random points the table CONVERTS to the
  * other format into a fresh dir, the converted copy must equal the
  * model VALUE-EXACTLY, and the sequence then continues ON THE CONVERT
  * (it becomes the new source). Round-tripping Delta→Iceberg→Delta→…
  * composes DV↔position-delete carry, equality-delete
  * positionalization, name mapping and column projection with live DML
  * in every interleaving — the cheapest way to find a translation bug
  * no hand-written pairing thought of. */
class ConvertFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("convfuzz_").toFile
    d.deleteOnExit(); d.getPath
  }

  /** `partitioned`: the tables carry an identity partition column
    * `b = id % 3` end to end — Delta keeps it OUT of its data files, so
    * every Delta→Iceberg convert exercises the manifest partition
    * tuples + per-file column projection (spec §Column Projection)
    * UNDER live DML, and every rewrite on the converted side must
    * restore the column into its output. */
  private def runSequence(seed: Int, nOps: Int,
                          partitioned: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    // three format states: delta, iceberg (v2), iceberg3 (deletion
    // vectors) — every convert and DML op composes across all of them
    var fmt = rnd.nextInt(3) match {
      case 0 => "delta"; case 1 => "iceberg"; case 2 => "iceberg3"
    }
    var base = tmp() + "/t0"
    var nextKey = 100L
    var converts = 0
    val parts = if (partitioned) Seq("b") else Seq.empty

    // the driver model: exact expected contents
    var model: Map[Long, Long] = (0L until 16L).map(k => k -> (k * 10)).toMap
    def withPart(pairs: Seq[(Long, Long)]) = {
      val df = pairs.toDF("id", "v")
      if (partitioned) df.withColumn("b", (col("id") % 3).cast("int"))
      else df
    }
    val seedDf = withPart(model.toSeq).coalesce(1)
    if (fmt == "delta") DeltaInterop.overwrite(seedDf, base, parts)
    else IcebergInterop.overwrite(seedDf, base, parts,
      formatVersion = if (fmt == "iceberg3") 3 else 2)

    def contents(): Map[Long, Long] = {
      val df = if (fmt == "delta") DeltaInterop.read(spark, base)
               else IcebergInterop.read(spark, base)
      // the partition column must ALSO read back right (projection!)
      if (partitioned) {
        val bad = df.filter(col("b") =!= (col("id") % 3).cast("int"))
          .limit(1).collect()
        assert(bad.isEmpty,
          s"seed=$seed: partition column drifted: ${bad.toSeq}")
      }
      df.select("id", "v").as[(Long, Long)].collect().toMap
    }
    def check(op: String): Unit = {
      // v3 row-lineage invariant: every assigned _row_id is unique
      // (files of an upgraded table may legally read NULL until
      // rewritten — the spec's lazy contract)
      if (fmt == "iceberg3") {
        val ids = IcebergInterop.readWithRowIds(spark, base)
          .select(IcebergInterop.RowIdCol).collect()
          .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
        assert(ids.distinct.length == ids.length,
          s"seed=$seed after $op: duplicate _row_id values " +
          s"(${ids.groupBy(identity).filter(_._2.length > 1).keys.take(5)})")
      }
      val got = contents()
      assert(got == model,
        s"seed=$seed after $op on $fmt ($converts converts): " +
        s"missing=${(model.keySet -- got.keySet).toSeq.sorted.take(8)} " +
        s"extra=${(got.keySet -- model.keySet).toSeq.sorted.take(8)} " +
        s"diff=${model.collect { case (k, v) if got.get(k).exists(_ != v) =>
          (k, v, got(k)) }.take(8)}")
    }

    (1 to nOps).foreach { _ =>
      rnd.nextInt(7) match {
        case 0 => // append fresh keys
          val ks = (0 until 1 + rnd.nextInt(3)).map(_ =>
            { val k = nextKey; nextKey += 1; k })
          val df = withPart(ks.map(k => (k, k * 10))).coalesce(1)
          if (fmt == "delta") DeltaInterop.append(df, base, parts)
          else IcebergInterop.append(df, base) // inherits spec + version
          model ++= ks.map(k => k -> (k * 10))
          check("append")
        case 1 if model.nonEmpty => // merge-on-read delete
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          if (fmt == "delta")
            DeltaDml.deleteVectoredWhere(spark, base, col("id") % m === r)
          else
            IcebergInterop.deletePositionsWhere(spark, base,
              col("id") % m === r)
          model = model.filterNot { case (k, _) => k % m == r }
          check("delete")
        case 2 if model.nonEmpty => // update
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          if (fmt == "delta")
            DeltaDml.updateWhere(spark, base, col("id") % m === r,
              Map("v" -> (col("v") + lit(1L))))
          else
            IcebergInterop.updateWhere(spark, base, col("id") % m === r,
              Map("v" -> (col("v") + lit(1L))))
          model = model.map { case (k, v) =>
            k -> (if (k % m == r) v + 1 else v) }
          check("update")
        case 3 => // keyed merge: touch some existing + insert fresh
          val existing = model.keys.toSeq.sorted.take(1 + rnd.nextInt(2))
          val fresh = (0 until 1).map(_ =>
            { val k = nextKey; nextKey += 1; k })
          val src = withPart((existing ++ fresh).map(k => (k, -k)))
          if (fmt == "delta") DeltaDml.mergeUpsert(spark, base, src, "id")
          else IcebergInterop.mergeUpsert(spark, base, src, Seq("id"))
          model ++= (existing ++ fresh).map(k => k -> -k)
          check("merge")
        case 4 if fmt == "iceberg" => // in-place v2 → v3 upgrade
          IcebergInterop.upgradeFormatVersion(base, 3)
          fmt = "iceberg3"
          check("upgrade")
        case _ => // CONVERT to the other format and continue there
          converts += 1
          val dst = tmp() + s"/t$converts"
          fmt match {
            case "delta" =>
              // target version drawn too: v3 carries DV blobs verbatim,
              // v2 decodes them into position deletes
              val v3 = rnd.nextBoolean()
              IcebergInterop.convertFromDelta(spark, base, dst,
                formatVersion = if (v3) 3 else 2)
              fmt = if (v3) "iceberg3" else "iceberg"
            case "iceberg" =>
              // CDC merges leave equality deletes — positionalize (one
              // scan, no rewrite), then the zero-copy convert carries
              // the positional state as deletion vectors
              IcebergInterop.positionalizeEqualityDeletes(spark, base)
              DeltaInterop.convertFromIceberg(spark, base, dst)
              fmt = "delta"
            case _ => // iceberg3
              // v3 forbids positionalization; a sorted rewrite folds
              // any live equality deletes (and vectors) first
              if (IcebergInterop.snapshot(spark, base).eqDeletes.nonEmpty)
                IcebergInterop.rewriteDataFilesSorted(spark, base, Seq("id"))
              DeltaInterop.convertFromIceberg(spark, base, dst)
              fmt = "delta"
          }
          base = dst
          check("convert")
      }
    }
    assert(converts >= 1, s"seed=$seed drew no convert — widen nOps")
  }

  test("seeded DML + convert round trips stay value-exact") {
    runSequence(seed = 4, nOps = 18)
    runSequence(seed = 77, nOps = 18)
    runSequence(seed = 2027, nOps = 24)
  }

  test("partitioned round trips: column projection holds under DML") {
    runSequence(seed = 13, nOps = 18, partitioned = true)
    runSequence(seed = 555, nOps = 22, partitioned = true)
  }
}
