package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

/** Manifest-level MIN/MAX segment statistics + predicate pruning
  * (round 13) — the lakehouse file-skipping idea one level up, applied
  * to whole segments before any Spark job is planned.
  *
  * Why: [[SnapshotWarehouse.deleteWhere]] probes every live segment
  * with the predicate. Parquet row-group stats make each probe cheap,
  * but a probe is still a Spark JOB per segment — at a 100k-segment
  * lake a takedown would launch 100k jobs to discover that 99,999
  * segments hold nothing. With per-segment long-column (min, max)
  * bounds stamped in the manifest at write time, provably-disjoint
  * segments are skipped DRIVER-SIDE with zero I/O; the same bounds
  * serve [[SnapshotWarehouse.readWhere]]'s query-side pruning (the
  * generalization of the stamped study-set skip to arbitrary range
  * predicates).
  *
  * Collection is footer-only: the stats (and the row count) come from
  * the parquet footers the write already produced — O(files) metadata
  * reads, never a second pass over the data. Sound under NULLs and
  * exclusions: min/max cover the non-null values of ALL physical rows
  * (a superset of the visible rows), and a comparison predicate is
  * never TRUE on NULL, so "bounds disjoint ⇒ no row matches" holds.
  */
object StatsPruning {

  /** Merge per-column INT64 (min, max) across every parquet file under
    * `dir` (recursing into hive partition subdirectories), plus the
    * exact row count from the block metadata. A column is dropped from
    * the map the moment ANY block lacks usable statistics — unknown
    * must mean "cannot skip", never "skip wrongly".
    */
  def collectLongStats(conf: Configuration, dir: HPath): (Long, Map[String, (Long, Long)]) = {
    val fs = dir.getFileSystem(conf)
    def files(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] = {
      val sts = fs.listStatus(p).toSeq
      sts.filter(_.isDirectory).flatMap(d => files(d.getPath)) ++
        sts.filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    var rows = 0L
    val mins = scala.collection.mutable.Map[String, Long]()
    val maxs = scala.collection.mutable.Map[String, Long]()
    val poisoned = scala.collection.mutable.Set[String]()
    files(dir).foreach { st =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, st.getPath, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      footer.getBlocks.forEach { b =>
        rows += b.getRowCount
        b.getColumns.forEach { c =>
          // top-level INT64 columns only — nested paths don't map to a
          // prunable predicate attribute
          if (c.getPath.size() == 1 &&
              c.getPrimitiveType.getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64) {
            val name = c.getPath.toDotString
            val s = c.getStatistics
            if (s == null || s.isEmpty) poisoned += name
            else if (s.hasNonNullValue) {
              val mn = s.genericGetMin.asInstanceOf[java.lang.Long].longValue()
              val mx = s.genericGetMax.asInstanceOf[java.lang.Long].longValue()
              mins(name) = math.min(mins.getOrElse(name, Long.MaxValue), mn)
              maxs(name) = math.max(maxs.getOrElse(name, Long.MinValue), mx)
            } // all-null block: contributes no values; bounds stay sound
          }
        }
      }
    }
    val stats = (mins.keySet -- poisoned).map(n => n -> (mins(n), maxs(n))).toMap
    (rows, stats)
  }

  /** Conservative "may any row satisfy `pred`?" against per-column
    * bounds. TRUE means "cannot prove otherwise — keep the segment";
    * only provable disjointness skips. Handles the AND/OR algebra and
    * the long-literal comparison/IN shapes; anything else is unknown.
    */
  def mayMatch(pred: Expression, bounds: Map[String, (Long, Long)]): Boolean = {
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference  => Some(a.name)
      case Cast(c, _, _, _)       => attrName(c)
      case _                      => None
    }
    def litLong(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Long, _)  => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      // the analyzer widens int literals against long columns with a
      // value-preserving Cast that only folds in the optimizer
      case Cast(c, t, _, _) if t == org.apache.spark.sql.types.LongType ||
        t == org.apache.spark.sql.types.IntegerType => litLong(c)
      case _ => None
    }
    def range(name: String): Option[(Long, Long)] = bounds.get(name)
    // normalize `l OP r` to (column, literal, op-with-column-first),
    // flipping the operator when the literal is on the left
    def norm(l: Expression, r: Expression, op: String): Option[(String, Long, String)] =
      (attrName(l), litLong(r)) match {
        case (Some(n), Some(x)) => Some((n, x, op))
        case _ => (attrName(r), litLong(l)) match {
          case (Some(n), Some(x)) =>
            val flipped = op match {
              case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
              case "=" => "="
            }
            Some((n, x, flipped))
          case _ => None
        }
      }
    def possible(n: String, x: Long, op: String): Boolean =
      range(n).forall { case (lo, hi) =>
        op match {
          case "="  => x >= lo && x <= hi
          case ">"  => hi > x
          case ">=" => hi >= x
          case "<"  => lo < x
          case "<=" => lo <= x
        }
      }
    pred match {
      case And(l, r) => mayMatch(l, bounds) && mayMatch(r, bounds)
      case Or(l, r)  => mayMatch(l, bounds) || mayMatch(r, bounds)
      case EqualTo(l, r) => norm(l, r, "=").forall((possible _).tupled)
      case GreaterThan(l, r) => norm(l, r, ">").forall((possible _).tupled)
      case GreaterThanOrEqual(l, r) => norm(l, r, ">=").forall((possible _).tupled)
      case LessThan(l, r) => norm(l, r, "<").forall((possible _).tupled)
      case LessThanOrEqual(l, r) => norm(l, r, "<=").forall((possible _).tupled)
      case In(a, vs) => attrName(a) match {
        case Some(n) =>
          val lits = vs.flatMap(litLong(_))
          if (lits.size != vs.size) true // non-literal member: unknown
          else range(n).forall { case (lo, hi) => lits.exists(x => x >= lo && x <= hi) }
        case None => true
      }
      case _ => true
    }
  }
}
