package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential property tests: the scalable formulations of the as-of
  * and band joins must equal their naive O(L·R) definitions on random
  * small inputs (10 trials each — every trial is a full Spark job).
  */
object OpsPropertySpec extends Properties("graft.ops") {

  private lazy val spark = SparkSpec.session

  private val rows: Gen[(List[(Long, String, Long)], List[(Long, String, Long, Double)])] =
    for {
      nl <- Gen.choose(1, 12)
      nr <- Gen.choose(0, 12)
      keys = Seq("a", "b")
      l <- Gen.listOfN(nl, for {
        k <- Gen.oneOf(keys); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      r <- Gen.listOfN(nr, for {
        k <- Gen.oneOf(keys); t <- Gen.choose(0L, 50L); v <- Gen.choose(1, 999)
      } yield (k, t, v.toDouble))
    } yield (
      l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      // unique (key, time) on the right: as-of tie-break among identical
      // times is undefined in both formulations
      r.zipWithIndex.map { case ((k, t, v), i) => (1000L + i, k, t, v) }
        .groupBy(x => (x._2, x._3)).map(_._2.head).toList)

  propertyWithSeed("asof == naive greatest-at-or-before", None) =
    Prop.forAllNoShrink(rows) { case (ls, rs) =>
      val s = spark
      import s.implicits._
      val left = ls.toDF("lid", "key", "t")
      val right = rs.toDF("rid", "key", "t", "v")
        .select(col("key"), col("t"), col("v"))
      val got = AsOfJoin.asof(left, right, Seq("key"), "t", Seq("v"))
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
        .toMap
      val want = ls.map { case (lid, k, t) =>
        val cands = rs.filter(r => r._2 == k && r._3 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(_._3)).map(_._4))
      }.toMap
      got == want
    }

  propertyWithSeed("asofMerged (custom exec) == asof (window formulation)", None) =
    Prop.forAllNoShrink(rows) { case (ls, rs) =>
      val s = spark
      import s.implicits._
      val left = ls.toDF("lid", "key", "t")
      val right = rs.toDF("rid", "key", "t", "v")
        .select(col("key"), col("t"), col("v"))
      def run(f: => org.apache.spark.sql.DataFrame) =
        f.select("lid", "v").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
          .toMap
      run(AsOfJoin.asofMerged(left, right, Seq("key"), "t", Seq("v"))) ==
        run(AsOfJoin.asof(left, right, Seq("key"), "t", Seq("v")))
    }

  propertyWithSeed("asofForward == naive smallest-at-or-after", None) =
    Prop.forAllNoShrink(rows) { case (ls, rs) =>
      val s = spark
      import s.implicits._
      val left = ls.toDF("lid", "key", "t")
      val right = rs.toDF("rid", "key", "t", "v")
        .select(col("key"), col("t"), col("v"))
      val got = AsOfJoin.asofForward(left, right, Seq("key"), "t", Seq("v"))
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
        .toMap
      val want = ls.map { case (lid, k, t) =>
        val cands = rs.filter(r => r._2 == k && r._3 >= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy(_._3)).map(_._4))
      }.toMap
      got == want
    }

  propertyWithSeed("asofNearest == naive closest-with-backward-ties", None) =
    Prop.forAllNoShrink(rows) { case (ls, rs) =>
      val s = spark
      import s.implicits._
      val left = ls.toDF("lid", "key", "t")
      val right = rs.toDF("rid", "key", "t", "v")
        .select(col("key"), col("t"), col("v"), col("t").as("mt"))
      val got = AsOfJoin.asofNearest(left, right, Seq("key"), "t",
        Seq("v", "mt"), "mt")
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
        .toMap
      val want = ls.map { case (lid, k, t) =>
        val bwd = rs.filter(r => r._2 == k && r._3 <= t)
          .sortBy(_._3).lastOption
        val fwd = rs.filter(r => r._2 == k && r._3 >= t)
          .sortBy(_._3).headOption
        lid -> ((bwd, fwd) match {
          case (Some(b), Some(f)) =>
            if (t - b._3 <= f._3 - t) Some(b._4) else Some(f._4)
          case (Some(b), None) => Some(b._4)
          case (None, Some(f)) => Some(f._4)
          case (None, None) => None
        })
      }.toMap
      got == want
    }

  propertyWithSeed("bandJoin == naive between filter", None) =
    Prop.forAllNoShrink(rows, Gen.choose(0L, 10L), Gen.choose(0L, 10L)) {
      case ((ls, rs), before, after) =>
        import org.scalacheck.Prop.propBoolean
        (before + after > 0) ==> {
          val s = spark
          import s.implicits._
          val left = ls.toDF("lid", "key", "t")
          val right = rs.toDF("rid", "key", "t", "v").select("rid", "key", "t")
          val got = RangeJoin.bandJoin(left, right, Seq("key"), "t", "t", before, after)
            .select("lid", "rid").as[(Long, Long)].collect().toSet
          val want = (for {
            (lid, lk, lt) <- ls
            (rid, rk, rt, _) <- rs
            if lk == rk && rt >= lt - before && rt <= lt + after
          } yield (lid, rid)).toSet
          got == want
        }
    }

  propertyWithSeed("saltedJoin == plain join for any factor", None) =
    Prop.forAllNoShrink(rows, Gen.choose(1, 6)) { case ((ls, rs), factor) =>
      val s = spark
      import s.implicits._
      val big = ls.toDF("lid", "key", "t")
      val small = rs.map(r => (r._2, r._4)).distinct.toDF("key", "v")
      val got = SkewJoin.saltedJoin(big, small, Seq("key"), factor)
        .select("lid", "v").as[(Long, Double)].collect().sorted.toSeq
      val want = big.join(small, Seq("key"))
        .select("lid", "v").as[(Long, Double)].collect().sorted.toSeq
      got == want
    }

  propertyWithSeed("hex64 codegen == md5 hex-string route on random strings", None) =
    Prop.forAllNoShrink(Gen.listOfN(8, Gen.asciiPrintableStr)) { strs =>
      val s = spark
      import s.implicits._
      val df = (strs :+ "").toDF("x")
      df.select(Hashing.hex64(col("x")).as("a"),
        conv(substring(md5(col("x")), 1, 15), 16, 10).cast("long").as("b"))
        .collect().forall(r => r.getLong(0) == r.getLong(1))
    }

  propertyWithSeed("splitAssign partitions totally and matches the bucket math", None) =
    Prop.forAllNoShrink(Gen.listOfN(40, Gen.choose(0L, 100000L)),
      Gen.choose(1, 98)) { (ids, cut1) =>
      val s = spark
      import s.implicits._
      val d = ids.distinct.toDF("id")
      val splits = Seq(("x", cut1), ("y", 100 - cut1))
      val got = Sampling.splitAssign(d, col("id"), splits)
        .select("id", "split").as[(Long, String)].collect().toMap
      // total: every row labeled with a declared name; exact per-row
      // agreement with the driver-side hash twin
      ids.distinct.forall { i =>
        val want = if (Hashing.hex64Local(i.toString) % 100 < cut1) "x" else "y"
        got(i) == want
      }
    }

  propertyWithSeed("boilerplate drop == naive per-source line filter", None) =
    Prop.forAllNoShrink(
      Gen.listOfN(8, for {
        src <- Gen.oneOf("s0", "s1")
        lines <- Gen.listOfN(4, Gen.oneOf("MENU", "FOOT", "a", "b", "c", ""))
      } yield (src, lines.mkString("\n"))),
      Gen.choose(2, 4)) { (docs, minDocs) =>
      val s = spark
      import s.implicits._
      val ds = docs.zipWithIndex.map { case ((src, t), i) => (i.toLong, src, t) }
      val got = TextStats.dropBoilerplateLines(
        ds.toDF("doc_id", "source", "text"), minDocs)
        .select("doc_id", "text_clean", "n_kept", "n_dropped")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      // naive: count distinct docs per (source, line), filter each doc
      val df = ds.flatMap { case (id, src, t) =>
        t.split("\n", -1).distinct.map(l => ((src, l), id))
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }
      ds.forall { case (id, src, t) =>
        val all = t.split("\n", -1)
        val kept = all.filter(l => df((src, l)) < minDocs)
        got(id) == ((kept.mkString("\n"), kept.length.toLong,
          (all.length - kept.length).toLong))
      }
    }

  propertyWithSeed("snapshotDiff applied to old reconstructs new", None) =
    Prop.forAllNoShrink(
      Gen.mapOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0, 3).map(v => s"v$v"))),
      Gen.mapOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0, 3).map(v => s"v$v")))
    ) { (oldM, newM) =>
      val s = spark
      import s.implicits._
      val oldDf = oldM.toSeq.toDF("k", "v")
      val newDf = newM.toSeq.toDF("k", "v")
      val diff = Diff.snapshotDiff(oldDf, newDf, Seq("k"))
        .select("k", "change_type", "new_v")
        .as[(Long, String, Option[String])].collect()
      // replaying the diff over the old snapshot must yield the new one
      val touched = diff.map(_._1).toSet
      val replayed = oldM.view.filterKeys(!touched.contains(_)).toMap ++
        diff.collect { case (k, t, Some(nv)) if t != "removed" => k -> nv }
      replayed == newM &&
        // and the classification is honest
        diff.forall {
          case (k, "added", _)   => !oldM.contains(k) && newM.contains(k)
          case (k, "removed", _) => oldM.contains(k) && !newM.contains(k)
          case (k, "changed", _) => oldM.get(k) != newM.get(k) &&
            oldM.contains(k) && newM.contains(k)
          case _                 => false
        }
    }

  propertyWithSeed("kAnonymize: no published group under k, counts conserved", None) =
    Prop.forAllNoShrink(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 6L), Gen.oneOf("g0", "g1", "g2"))),
      Gen.choose(1L, 4L)) { (rows, k) =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("user_id", "grp")
      val out = Privacy.kAnonymize(df, Seq("grp"), k, "user_id")
        .select("grp", "n_ids", "n_rows").as[(String, Long, Long)].collect()
      val (bucket, kept) = out.partition(_._1 == "__suppressed__")
      val naive = rows.groupBy(_._2).view
        .mapValues(v => (v.map(_._1).distinct.size.toLong, v.size.toLong)).toMap
      val suppressed = naive.filter(_._2._1 < k)
      kept.forall(r => r._2 >= k && naive(r._1) == ((r._2, r._3))) &&
        out.map(_._3).sum == rows.size.toLong &&
        (if (suppressed.isEmpty) bucket.isEmpty
         else bucket.toSeq == Seq(("__suppressed__",
           rows.filter(r => suppressed.contains(r._2)).map(_._1).distinct.size.toLong,
           suppressed.values.map(_._2).sum)))
    }

  propertyWithSeed("dedupKeepBest: groups partition the input; kept doc carries the group max quality", None) =
    Prop.forAllNoShrink(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 4),
        Gen.oneOf("", "!!!! ????", "in the sun", "IN THE SUN", "a good day here")))) { texts =>
      val s = spark
      import s.implicits._
      // ids unique; text = base phrase + variant suffix so several
      // renditions share a normalized group with different quality
      val rows = texts.zipWithIndex.map { case ((base, suffix), i) =>
        (i.toLong, s"the cat number $base sat $suffix")
      }
      val df = rows.toDF("doc_id", "text")
      val out = Dedup.dedupKeepBest(df)
        .select("n_copies", "keep_id", "best_quality")
        .as[(Long, Long, Double)].collect()
      val quality = TextStats.withQualityColumns(df)
        .select(col("doc_id"), round(col("quality_score"), 6))
        .as[(Long, Double)].collect().toMap
      val groups = rows.groupBy { case (_, t) =>
        t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      }.values.toSeq
      out.map(_._1).sum == rows.size.toLong &&
        out.length == groups.size &&
        out.forall { case (_, keepId, bestQ) =>
          quality(keepId) == bestQ &&
            // the kept doc's quality is maximal in SOME group containing it
            groups.find(_.exists(_._1 == keepId))
              .exists(g => g.map(r => quality(r._1)).max == bestQ &&
                g.filter(r => quality(r._1) == bestQ).map(_._1).min == keepId)
        }
    }

  propertyWithSeed("tercileBuckets: verdicts conserve rows and order with the score", None) =
    Prop.forAllNoShrink(
      Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("en", "de"), Gen.choose(0, 100)))) { rows0 =>
      val s = spark
      import s.implicits._
      val rows = rows0.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v.toDouble) }
      val out = Profiling.tercileBuckets(rows.toDF("id", "grp", "score"),
        Seq("grp"), "score")
        .select("id", "grp", "score", "bucket")
        .as[(Long, String, Double, String)].collect()
      val rank = Map("tail" -> 0, "middle" -> 1, "head" -> 2)
      out.length == rows.size &&
        // within a group, bucket rank is monotone in the score
        out.groupBy(_._2).values.forall { g =>
          g.sortBy(_._3).sliding(2).forall {
            case Array(a, b) => rank(a._4) <= rank(b._4) || a._3 == b._3
            case _           => true
          }
        } &&
        // equal scores in a group always land in the same bucket
        out.groupBy(r => (r._2, r._3)).values.forall(_.map(_._4).distinct.length == 1)
    }

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)
}
