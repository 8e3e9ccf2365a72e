// Shim in the Spark namespace: classic.Dataset.ofRows is private[sql],
// and executing a tiny stats aggregate over the join children at plan
// time is how the adaptive bucket width avoids the hand-tune knob.
package org.apache.spark.sql {
  object GraftPlanRun {
    def head(spark: SparkSession,
        plan: catalyst.plans.logical.LogicalPlan): Row =
      classic.Dataset.ofRows(
        spark.asInstanceOf[classic.SparkSession], plan).head()
  }
}

package graft.plans {

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Max, Min}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, LogicalPlan, Project, RepartitionByExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

import scala.util.control.NonFatal

/** Optimizer rule: rewrite interval-overlap theta joins into bucketed
  * equi-joins (SURVEY.md §4.3 — the range-join weakness of vanilla Spark).
  *
  * Pattern: an inner join whose condition contains the overlap predicate
  *
  *   a_lo <= b_hi  AND  b_lo <= a_hi
  *
  * over integral columns from opposite sides and NO equi-join conjunct.
  * Vanilla Spark can only plan that as BroadcastNestedLoopJoin (or a
  * cartesian product) — O(|A|·|B|) comparisons and a broadcast
  * requirement. The rewrite explodes each interval into fixed-width
  * buckets and joins on bucket equality:
  *
  *   Generate(explode(sequence(lo div W, hi div W)))  on each side
  *   JOIN ON bucket_a = bucket_b            — hash-partitionable!
  *        AND <original overlap predicate>  — residual exactness
  *        AND bucket_a = greatest(a_lo div W, b_lo div W)
  *                                          — emit each pair exactly once
  *                                            (in its first shared bucket)
  *
  * The equality key makes the join shuffle-hash/sort-merge plannable: at
  * 100 TB both sides hash-partition by bucket and only bucket-local pairs
  * are compared. The canonical-bucket conjunct replaces a Distinct — no
  * extra shuffle for dedup.
  *
  * Preconditions (documented contract, standard for range-join
  * optimizers): intervals are well-formed (lo <= hi per row). Bucket
  * width is DERIVED from data statistics at plan time by default
  * (`spark.graft.rangeJoin.bucketWidth` = "auto": one tiny min/max/avg
  * aggregate per side, then the [[deriveWidth]] cost model — VERDICT
  * r13 item 3); an explicit numeric conf value overrides. A good width
  * respects BOTH the typical interval length (each interval should span
  * O(1) buckets — replication is 1 + length/W) AND the value DOMAIN
  * (key cardinality is domain/W; it must exceed the shuffle parallelism
  * or most cores idle — on a narrow domain, prefer the smallest W the
  * replication budget allows).
  *
  * The rewrite pins its shuffle with an EXPLICIT partition count
  * (`spark.graft.rangeJoin.numPartitions`, default 2× the session's
  * shuffle partitions): this join class has dimension-sized INPUT but
  * pair-volume OUTPUT, and AQE sizes stages by shuffle-READ bytes — left
  * to itself it coalesces the join to single digits of tasks and one
  * task computes the entire pair explosion (measured at sf1: 37 tasks,
  * 5-core average on a 150 s run; pinned: 31.8 s). The 2× multiple
  * smooths hash collisions when domain/W is only a small multiple of
  * the core count. Known trade: a user-specified repartition opts out
  * of AQE skew-splitting — bucket skew is bounded by the uniform
  * explode, and the canonical-bucket conjunct keeps per-bucket output
  * proportional to per-bucket input.
  *
  * Enabled via `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketAttrPrefix = "__graft_bucket_"

  /** Explicit width override; "auto" (the default) derives the width
    * from data statistics at plan time — see [[deriveWidth]]. The
    * round-13 lesson behind the default: a fixed W=50 on the demo's
    * [0, 540] domain yielded 11 join keys and an ≤11-task parallelism
    * collapse at sf1 (126 s), and a 100× user with an unknown domain
    * would re-create it; the width MUST respect both replication
    * (1 + len/W per row) and parallelism (domain/W ≥ shuffle fan-out),
    * which only the data can say. */
  private def bucketWidthConf: String =
    conf.getConfString("spark.graft.rangeJoin.bucketWidth", "auto").trim

  /** Runtime guard: an interval spanning more than this many buckets
    * (relative to bucketWidth) raises a descriptive error instead of
    * exploding into a near-unbounded `sequence()` (array-size limit / OOM
    * with a message that wouldn't mention this rule). Raise the width or
    * this cap for genuinely huge intervals. */
  private def maxSpanBuckets: Long =
    conf.getConfString("spark.graft.rangeJoin.maxSpanBuckets", "4096").toLong

  /** Explicit partition count for the bucket shuffle (see class doc);
    * 0 = derive as 2× the session's shuffle parallelism. */
  private def numPartitions: Int = {
    val n = conf.getConfString("spark.graft.rangeJoin.numPartitions", "0").toInt
    if (n > 0) n else conf.numShufflePartitions * 2
  }

  /** Plan-time interval stats for one join side: (min lo, max hi,
    * mean length, max length). One tiny global aggregate executed at
    * optimization time — the range-join input is dimension-sized by
    * this rule's own contract (pair-volume OUTPUT is the blow-up, not
    * the input), so the scan is cheap relative to the join it tunes,
    * and the result is memoized per canonicalized (child, lo, hi) so
    * optimizer re-application (fixed-point batches, multi-pass) pays
    * once. None on any failure → caller falls back to the fixed
    * default. */
  private def sideStats(child: LogicalPlan, lo: Expression,
      hi: Expression): Option[(Long, Long, Double, Long)] = {
    // Keyed on the CANONICALIZED plan/expressions themselves, not their
    // hashes (ADVICE r14): a hash collision would silently reuse another
    // plan's interval stats and derive a wrong width (perf-only, but the
    // whole point of measuring is not to guess). Canonicalized trees
    // compare structurally, and the 64-entry clear bounds retention.
    val key = (child.canonicalized, lo.canonicalized, hi.canonicalized)
    statsCache.get(key) match {
      case Some(v) => v
      case None =>
        val v =
          try {
            val loL = Cast(lo, LongType)
            val hiL = Cast(hi, LongType)
            val len = Subtract(Cast(hi, LongType), Cast(lo, LongType))
            val aggs = Seq(
              Alias(Min(loL).toAggregateExpression(), "mn")(),
              Alias(Max(hiL).toAggregateExpression(), "mx")(),
              Alias(Cast(Average(len).toAggregateExpression(),
                DoubleType), "av")(),
              Alias(Max(len).toAggregateExpression(), "ml")())
            val spark = SparkSession.active
            val r = org.apache.spark.sql.GraftPlanRun.head(spark,
              Aggregate(Nil, aggs, child))
            if ((0 to 3).exists(r.isNullAt)) None
            else Some((r.getLong(0), r.getLong(1), r.getDouble(2),
              r.getLong(3)))
          } catch { case NonFatal(_) => None }
        statsCache.synchronized {
          if (statsCache.size > 64) statsCache.clear()
          statsCache.update(key, v)
        }
        v
    }
  }
  private val statsCache =
    scala.collection.concurrent.TrieMap
      .empty[(LogicalPlan, Expression, Expression),
        Option[(Long, Long, Double, Long)]]

  /** MEASURED mean bucket replication per candidate width — one more
    * aggregate per side, every grid width as a column of the same row:
    * avg(hi divW − lo divW) + 1 under the exact IntegralDivide the
    * bucket Generate uses. Exists because the closed-form 1 + len/W
    * is blind to LATTICE ALIGNMENT: the r14 sf1 A/B measured W=9 at
    * 1.62× the task time of W=10 on the demo data — a_lo is a multiple
    * of 10, so W=10 spans exactly 3 buckets per interval where the
    * average-length model predicted 3.5 vs 3.78 (a 6% difference that
    * was really 26%). Empty map on failure → caller falls back to the
    * closed form. */
  private def replStats(child: LogicalPlan, lo: Expression,
      hi: Expression, grid: Seq[Long]): Map[Long, Double] = {
    val key = (child.canonicalized, lo.canonicalized, hi.canonicalized,
      grid)
    replCache.get(key) match {
      case Some(v) => v
      case None =>
        val v =
          try {
            val aggs = grid.map { w =>
              val span = Subtract(divW(hi, w), divW(lo, w))
              Alias(Cast(Average(span).toAggregateExpression(),
                DoubleType), s"r$w")()
            }
            val r = org.apache.spark.sql.GraftPlanRun.head(
              SparkSession.active, Aggregate(Nil, aggs, child))
            if (grid.indices.exists(r.isNullAt)) Map.empty[Long, Double]
            else grid.zipWithIndex
              .map { case (w, i) => w -> (r.getDouble(i) + 1.0) }.toMap
          } catch { case NonFatal(_) => Map.empty[Long, Double] }
        replCache.synchronized {
          if (replCache.size > 64) replCache.clear()
          replCache.update(key, v)
        }
        v
    }
  }
  private val replCache = scala.collection.concurrent.TrieMap
    .empty[(LogicalPlan, Expression, Expression, Seq[Long]),
      Map[Long, Double]]

  /** Candidate widths: geometric ×1.15 (≥ +1) from the span-guard
    * floor up to the domain, capped at 64 evaluations. */
  private[graft] def widthGrid(domain: Long, maxLen: Long,
      spanCap: Long): Seq[Long] = {
    val wMin = math.max(1L, (maxLen + spanCap - 1) / spanCap)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var w = wMin
    while (w <= math.max(domain, wMin) && buf.size < 64) {
      buf += w
      w = math.max(w + 1, (w * 1.15).toLong)
    }
    buf.toSeq
  }

  /** Pick the width minimizing the rule's cost model over the grid,
    * with MEASURED mean replications (see [[replStats]]):
    *
    *   candidates(W) ∝ replA(W) · replB(W) · W / domain
    *     (per-bucket co-occupancy: |A|·replA/K · |B|·replB/K summed
    *      over K = domain/W keys)
    *   parallelism(W) = min(domain / W, numPartitions)
    *   cost(W) = candidates(W) / parallelism(W)
    *
    * Small W buys parallelism (more bucket keys) at extra replication
    * and candidate volume; large W cuts replication but starves the
    * shuffle — the two-sided constraint the r13 hand-tune balanced.
    * With the measured replications this lands ON the hand-tuned
    * optimum for the demo (W=10: the lattice-aligned 3-bucket span
    * beats W=9's 3.78 despite fewer keys); the closed-form fallback
    * (repl = 1 + meanLen/W, used when the repl job fails) lands in the
    * same regime one notch lower. The grid's span-guard floor keeps
    * auto mode from ever tripping the per-row span error. */
  private[graft] def deriveWidth(domain: Long, grid: Seq[Long],
      replA: Long => Double, replB: Long => Double, parts: Int): Long = {
    val dom = math.max(domain, 1L).toDouble
    def cost(w: Long): Double = {
      val cand = replA(w) * replB(w) * w / dom
      val par = math.min(dom / w, parts.toDouble).max(1.0)
      cand / par
    }
    grid.minBy(w => cost(w)) // ties resolve to the smaller width
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Extract (aLo, aHi, bLo, bHi, others) where a* reference only `left`
    * and b* only `right`. */
  private def matchOverlap(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Expression, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // No equi conjunct across sides — otherwise Spark already has a key.
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    // Normalize each cross-side <= into (leftExpr, rightExpr) meaning
    // leftExpr <= rightExpr.
    def asLe(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(l, r) => Some((l, r))
      case GreaterThanOrEqual(l, r) => Some((r, l))
      case _ => None
    }
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet) && isIntegral(e)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet) && isIntegral(e)

    val les = conjuncts.flatMap(asLe)
    // a_lo <= b_hi : left-expr <= right-expr
    val lr = les.filter { case (l, r) => fromLeft(l) && fromRight(r) }
    // b_lo <= a_hi : right-expr <= left-expr
    val rl = les.filter { case (l, r) => fromRight(l) && fromLeft(r) }
    (lr, rl) match {
      case (Seq((aLo, bHi)), Seq((bLo, aHi))) =>
        val used: Set[Expression] = Set(
          LessThanOrEqual(aLo, bHi), GreaterThanOrEqual(bHi, aLo),
          LessThanOrEqual(bLo, aHi), GreaterThanOrEqual(aHi, bLo))
        val others = conjuncts.filterNot(c => used.exists(_.semanticEquals(c)))
        // `others` must not be the source of the matched predicates; keep
        // any genuinely extra conjuncts as residuals.
        Some((aLo, aHi, bLo, bHi, others.filterNot(c => asLe(c).exists(p =>
          (p._1.semanticEquals(aLo) && p._2.semanticEquals(bHi)) ||
            (p._1.semanticEquals(bLo) && p._2.semanticEquals(aHi))))))
      case _ => None
    }
  }

  private def divW(e: Expression, w: Long): Expression =
    new IntegralDivide(Cast(e, LongType), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.output.exists(_.name.startsWith(BucketAttrPrefix)) =>
      matchOverlap(cond, left, right) match {
        case Some((aLo, aHi, bLo, bHi, _)) =>
          // Width resolution: explicit conf wins; "auto" (default)
          // measures both sides and minimizes the cost model. The
          // chosen width + source land in the bench attribution so a
          // slow range join names its own tuning.
          val w = bucketWidthConf match {
            case "auto" =>
              (sideStats(left, aLo, aHi), sideStats(right, bLo, bHi)) match {
                case (Some((amn, amx, aav, aml)), Some((bmn, bmx, bav, bml))) =>
                  val domain = math.max(amx, bmx) - math.min(amn, bmn) + 1
                  val grid = widthGrid(domain, math.max(aml, bml),
                    maxSpanBuckets)
                  // measured replication where the job succeeds, the
                  // closed-form 1 + meanLen/W where it doesn't
                  val ra = replStats(left, aLo, aHi, grid)
                  val rb = replStats(right, bLo, bHi, grid)
                  def repl(m: Map[Long, Double], meanLen: Double)(
                      wc: Long): Double =
                    m.getOrElse(wc, 1.0 + meanLen / wc)
                  val dw = deriveWidth(domain, grid,
                    repl(ra, aav), repl(rb, bav), numPartitions)
                  graft.Attrib.note("range_join_width", dw)
                  graft.Attrib.note("range_join_width_source",
                    if (ra.nonEmpty && rb.nonEmpty) "auto-measured"
                    else "auto-closed-form")
                  dw
                case _ =>
                  // stats unavailable (empty side, exotic child plan):
                  // the historical fixed default
                  graft.Attrib.note("range_join_width", 50L)
                  graft.Attrib.note("range_join_width_source", "fallback")
                  50L
              }
            case v =>
              val dw = v.toLong
              graft.Attrib.note("range_join_width", dw)
              graft.Attrib.note("range_join_width_source", "conf")
              dw
          }
          // sequence() over non-null integral bounds yields non-null
          // elements; the attr nullability must match Explode's schema.
          val bucketL = AttributeReference(BucketAttrPrefix + "l", LongType,
            nullable = false)()
          val bucketR = AttributeReference(BucketAttrPrefix + "r", LongType,
            nullable = false)()
          val maxSpan = maxSpanBuckets
          def gen(child: LogicalPlan, lo: Expression, hi: Expression,
              out: AttributeReference) = {
            val loB = divW(lo, w)
            val hiB = divW(hi, w)
            // Post-analysis construction: TimeZoneAwareExpression needs
            // an explicit timeZoneId to count as resolved.
            val seq = Sequence(loB, hiB, None, Some(conf.sessionLocalTimeZone))
            // Per-row span guard: fail with a message that names the rule
            // and the tuning knobs rather than an opaque array-size error.
            val guarded = If(
              LessThanOrEqual(Subtract(hiB, loB), Literal(maxSpan)),
              seq,
              Cast(new RaiseError(Literal(
                s"graft.plans.RangeJoinRewrite: interval spans more than " +
                  s"$maxSpan buckets at bucketWidth=$w; raise " +
                  "spark.graft.rangeJoin.bucketWidth or " +
                  "spark.graft.rangeJoin.maxSpanBuckets")), seq.dataType))
            Generate(Explode(guarded),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(out), child = child)
          }
          val n = numPartitions
          val newLeft = RepartitionByExpression(
            Seq(bucketL), gen(left, aLo, aHi, bucketL), Some(n))
          val newRight = RepartitionByExpression(
            Seq(bucketR), gen(right, bLo, bHi, bucketR), Some(n))
          val canonical = EqualTo(bucketL,
            Greatest(Seq(divW(aLo, w), divW(bLo, w))))
          val newCond = And(And(EqualTo(bucketL, bucketR), cond), canonical)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }
}

} // package graft.plans
