package graft.sources.fimi

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DATA SKIPPING over the manifest's per-file content stats
  * (`#stats <file> <json>`, see [[FimiLog.Manifest.stats]]): a pushed
  * predicate on an EVOLVED scalar column prunes whole files whose
  * recorded min/max/null-count PROVE no row can match — the
  * Delta/Iceberg column-stats skip, on the fimi manifest. Everything is
  * conservative: a file with no stats (legacy writer, adopted native
  * file, pre-evolution generation), an un-evaluable predicate shape, or
  * a type outside the comparable set keeps the file; and every pushed
  * filter stays RESIDUAL above the scan (the connector's tid-range
  * rule), so skipping is a pure work-skip, never a semantics change.
  *
  * Scale posture: evaluation is driver-side planning arithmetic —
  * O(files × pushed filters) comparisons on already-cached manifest
  * metadata, zero data reads for skipped files. At 100 TB with
  * sort-clustered layout (`CALL system.optimize(..., zorder => ...)`),
  * a selective predicate reads the few files whose range covers it. */
private[fimi] object FimiStats {

  /** One column's recorded stats: min/max absent when every value in
    * the file is null. */
  case class ColStats(min: Option[Any], max: Option[Any], nulls: Long)

  case class FileStats(rows: Long, cols: Map[String, ColStats])

  /** Parse a `#stats` JSON against the table's extra columns (values
    * decode per the column's declared type). Unknown columns are
    * ignored; a malformed blob reads as no-stats (conservative). */
  def parse(json: String, extras: Map[String, DataType]): Option[FileStats] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(json)
      val rows = root.get("rows").asLong()
      val colsNode = root.get("cols")
      val cols = Map.newBuilder[String, ColStats]
      extras.foreach { case (name, dt) =>
        val c = if (colsNode == null) null else colsNode.get(name)
        if (c != null) {
          def v(field: String): Option[Any] = Option(c.get(field)).map { n =>
            dt match {
              case StringType => UTF8String.fromString(n.asText())
              case LongType | TimestampType => n.asLong()
              case IntegerType | DateType => n.asInt()
              case DoubleType => n.asDouble()
              case BooleanType => n.asBoolean()
              case other => throw new IllegalStateException(
                s"fimi stats: unsupported type $other")
            }
          }
          val (mn, mx) = (v("min"), v("max"))
          // min and max travel as a pair; a blob carrying only one
          // (hand-edited manifest, format drift) degrades that column
          // to no-stats rather than crash planning on the missing bound
          if (mn.isDefined == mx.isDefined)
            cols += name -> ColStats(mn, mx,
              Option(c.get("nulls")).map(_.asLong()).getOrElse(0L))
        }
      }
      Some(FileStats(rows, cols.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Render a stats JSON from internal values (the writer-side and
    * merge-side serializer — byte-compatible with [[parse]]). */
  def render(rows: Long, cols: Seq[(String, DataType, ColStats)]): String = {
    val body = cols.map { case (n, dt, cs) =>
      val mm = cs.min.map(v =>
        s""","min":${FimiTable.encodeValue(v, dt)}""" +
          s""","max":${FimiTable.encodeValue(cs.max.get, dt)}""").getOrElse("")
      s"""${FimiTable.jsonName(n)}:{"nulls":${cs.nulls}$mm}"""
    }.mkString(",")
    s"""{"rows":$rows,"cols":{$body}}"""
  }

  /** Merge member-file stats into one bin's stats (OPTIMIZE byte-copies
    * members, so the bin's content is exactly their union): rows and
    * null-counts sum, min/max widen. None when ANY member lacks stats —
    * a partially-derived range could prune live rows (callers may
    * synthesize all-null stats for members provably written before
    * every evolved column existed). A member with stats but no entry
    * for a column was written before THAT column existed — immutability
    * makes it all-null there (rows nulls, no min/max). */
  def merge(
      parsed: Seq[Option[FileStats]],
      extras: Map[String, DataType]): Option[String] = {
    if (parsed.isEmpty || parsed.exists(_.isEmpty)) return None
    val sts = parsed.map(_.get)
    val rows = sts.map(_.rows).sum
    val cols = extras.toSeq.sortBy(_._1).map { case (name, dt) =>
      val per = sts.map(st =>
        st.cols.getOrElse(name, ColStats(None, None, st.rows)))
      val mins = per.flatMap(_.min)
      val maxs = per.flatMap(_.max)
      val mn = mins.reduceOption((a, b) =>
        if (FimiTable.compareCells(dt, a, b) <= 0) a else b)
      val mx = maxs.reduceOption((a, b) =>
        if (FimiTable.compareCells(dt, a, b) >= 0) a else b)
      (name, dt, ColStats(mn, mx, per.map(_.nulls).sum))
    }
    Some(render(rows, cols))
  }

  /** Filter values arrive as EXTERNAL types; convert to the internal
    * comparison domain. None = not comparable (conservative keep). */
  private def internal(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (StringType, s: String) => Some(UTF8String.fromString(s))
    case (LongType, l: Long) => Some(l)
    case (LongType, l: java.lang.Long) => Some(l.longValue())
    case (IntegerType, i: Int) => Some(i)
    case (IntegerType, i: java.lang.Integer) => Some(i.intValue())
    case (DoubleType, d: Double) => Some(d)
    case (DoubleType, d: java.lang.Double) => Some(d.doubleValue())
    case (BooleanType, b: Boolean) => Some(b)
    case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue())
    // Date/Timestamp filter values vary with the java8 API setting —
    // conservative keep rather than risk a conversion mismatch
    case _ => None
  }

  /** True when a pushed filter is a candidate for stats evaluation on
    * one of `extras` (used by pushFilters to report pushed filters). */
  def prunable(f: Filter, extras: Map[String, DataType]): Boolean = f match {
    case EqualTo(c, _) => extras.contains(c)
    case GreaterThan(c, _) => extras.contains(c)
    case GreaterThanOrEqual(c, _) => extras.contains(c)
    case LessThan(c, _) => extras.contains(c)
    case LessThanOrEqual(c, _) => extras.contains(c)
    case In(c, _) => extras.contains(c)
    case IsNull(c) => extras.contains(c)
    case IsNotNull(c) => extras.contains(c)
    case And(l, r) => prunable(l, extras) || prunable(r, extras)
    case Or(l, r) => prunable(l, extras) && prunable(r, extras)
    case _ => false
  }

  /** May any row of a file with these stats match `f`? Conservative
    * true on anything not provably false. */
  def mayMatch(st: FileStats, f: Filter, extras: Map[String, DataType]): Boolean = {
    def col(c: String): Option[(DataType, ColStats)] =
      extras.get(c).flatMap(dt => st.cols.get(c).map(dt -> _))
    def cmpTo(dt: DataType, bound: Any, v: Any): Int =
      FimiTable.compareCells(dt, bound, v)
    f match {
      case EqualTo(c, value) => col(c) match {
        case Some((dt, cs)) => internal(dt, value) match {
          case Some(v) => cs.min match {
            case None => false // every value null — equality never matches
            case Some(mn) =>
              cmpTo(dt, mn, v) <= 0 && cmpTo(dt, cs.max.get, v) >= 0
          }
          case None => true
        }
        case None => true
      }
      case GreaterThan(c, value) => col(c) match {
        case Some((dt, cs)) => internal(dt, value) match {
          case Some(v) => cs.max.exists(mx => cmpTo(dt, mx, v) > 0)
          case None => true
        }
        case None => true
      }
      case GreaterThanOrEqual(c, value) => col(c) match {
        case Some((dt, cs)) => internal(dt, value) match {
          case Some(v) => cs.max.exists(mx => cmpTo(dt, mx, v) >= 0)
          case None => true
        }
        case None => true
      }
      case LessThan(c, value) => col(c) match {
        case Some((dt, cs)) => internal(dt, value) match {
          case Some(v) => cs.min.exists(mn => cmpTo(dt, mn, v) < 0)
          case None => true
        }
        case None => true
      }
      case LessThanOrEqual(c, value) => col(c) match {
        case Some((dt, cs)) => internal(dt, value) match {
          case Some(v) => cs.min.exists(mn => cmpTo(dt, mn, v) <= 0)
          case None => true
        }
        case None => true
      }
      case In(c, values) =>
        values.exists(v => mayMatch(st, EqualTo(c, v), extras))
      case IsNull(c) => col(c) match {
        case Some((_, cs)) => cs.nulls > 0
        case None => true
      }
      case IsNotNull(c) => col(c) match {
        case Some((_, cs)) => cs.nulls < st.rows
        case None => true
      }
      case And(l, r) => mayMatch(st, l, extras) && mayMatch(st, r, extras)
      case Or(l, r) => mayMatch(st, l, extras) || mayMatch(st, r, extras)
      case _ => true
    }
  }
}
