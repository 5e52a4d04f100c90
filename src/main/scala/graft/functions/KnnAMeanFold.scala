package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, CaseWhen, CreateNamedStruct, Divide, EqualTo, Expression, Greatest, If, IsNull, Least, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** The bounded top-`k` cosine fold of the self-kNN a-mean leg as a
  * FIXED-WIDTH codegen aggregate: buffer = `k` descending double slots
  * (a sorted-insert min/max network) + a pair count, evaluated to the
  * `(a, ck, nk)` struct [[Similarity.imiKnnAMeansOver]] publishes.
  *
  * Why this exists (round-12, the third-decade margin build): the leg
  * used to reduce its pair stream through the typed [[TopKByScore]]
  * `Aggregator` + a second `collect_list` pass. Typed aggregation runs
  * on `ObjectHashAggregateExec`, which falls back to SORT-based
  * aggregation past `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` (default 128) DISTINCT KEYS PER PARTITION — and
  * this leg keys by corpus row id, so at any real corpus size every
  * partition blows the threshold and the fallback externally sorts the
  * ENTIRE candidate-pair stream (n·nProbe·cellSize rows). At the 2M
  * deck that is ~16B rows ≈ hundreds of GB of sort spill: the build
  * did not finish in 45 minutes (SCALE.md r11). A `DeclarativeAggregate`
  * over primitive buffer slots runs on `HashAggregateExec` instead,
  * whose partial aggregation consumes the join's output IN-STAGE under
  * whole-stage codegen and spills only the per-GROUP buffers (k+1
  * numbers per corpus row) — the pair stream itself is never
  * materialized, sorted, or spilled, at any corpus size.
  *
  * Bit-parity with the shape it replaces (the oracle-gated contract):
  *  - the kept top-k VALUES are the same multiset (ties at the k
  *    boundary may keep a different neighbor ID, but only the cosine
  *    VALUES enter the outputs — [[TopKByScore]]'s id tie-break was
  *    invisible downstream for exactly this reason);
  *  - `a` sums the kept values in ASCENDING order seeded from literal
  *    0.0 — `aggregate(sort_array(collect_list(cos)), 0.0, _+_)`'s
  *    exact IEEE sequence, rebuilt per `nk` via a CASE over the
  *    descending slots — then divides by `nk`;
  *  - `ck` = the smallest kept value (= `element_at(sorted, 1)`) and
  *    `nk` = the kept count, the displacement-bound columns.
  * Sparse groups (fewer than `k` pairs) leave `-Inf` padding in the
  * tail slots; `nk` masks it out of every output. A group with zero
  * pairs cannot occur (the join emits no row), but evaluates to a
  * null-field struct rather than garbage if it ever did.
  */
case class KnnAMeanFold(cos: Expression, k: Int) extends DeclarativeAggregate {
  require(k >= 1 && k <= 64, s"knn fold supports 1..64 slots, got $k")

  override def children: Seq[Expression] = Seq(cos)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(cos = newChildren.head)
  override def nullable: Boolean = true
  override def prettyName: String = "knn_amean_fold"
  override def dataType: DataType = StructType(Seq(
    StructField("a", DoubleType), StructField("ck", DoubleType),
    StructField("nk", LongType, nullable = false)))

  private lazy val slots: Seq[AttributeReference] =
    (1 to k).map(i => AttributeReference(s"b$i", DoubleType, nullable = false)())
  private lazy val cnt: AttributeReference =
    AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots :+ cnt

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(Double.NegativeInfinity)) :+ Literal(0L)

  /** Sorted-insert network: slots held descending; inserting `x` keeps
    * the k largest. Each step keeps the larger of (slot, carry) and
    * carries the smaller down — k min/max pairs, all codegen.
    */
  private def insertInto(bufs: Seq[Expression], x: Expression): Seq[Expression] = {
    var carry = x
    bufs.map { b =>
      val kept = Greatest(Seq(b, carry))
      carry = Least(Seq(b, carry))
      kept
    }
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val inserted = insertInto(slots, cos)
    val guarded =
      if (cos.nullable) inserted.zip(slots).map { case (nb, b) => If(IsNull(cos), b, nb) }
      else inserted
    val bump = if (cos.nullable) If(IsNull(cos), cnt, Add(cnt, Literal(1L)))
      else Add(cnt, Literal(1L))
    guarded :+ bump
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // selection formula, NOT k chained inserts: the m-th largest of two
    // merged descending arrays is max(B_m, A_m, max_{0<i<m} min(A_i,
    // B_{m-i})) — every output slot is an independent O(m)-term
    // expression over the ORIGINAL buffer attributes. Chained inserts
    // shared each pass's carry nodes between a Greatest and a Least,
    // and Catalyst walks expressions as TREES: the shared-carry DAG
    // expands to ~C(2k, k) root-to-leaf paths, hanging analysis past
    // k ≈ 12. This shape is O(k²) nodes and O(k²) paths — k = 64 is
    // fine (KnnAMeanFoldSpec pins parity through k = 16 merges).
    // -Inf padding needs no special case: min(x, -Inf) = -Inf loses to
    // any real term, and an all-padding slot correctly stays -Inf.
    val merged = (1 to k).map { m =>
      val terms: Seq[Expression] =
        slots(m - 1).right +: slots(m - 1).left +:
          (1 until m).map(i =>
            Least(Seq(slots(i - 1).left, slots(m - i - 1).right)))
      if (terms.size == 1) terms.head else Greatest(terms)
    }
    merged :+ Add(cnt.left, cnt.right)
  }

  override lazy val evaluateExpression: Expression = {
    val nk = Least(Seq(cnt, Literal(k.toLong)))
    // ((0.0 + b_m) + b_{m-1}) + ... + b_1: the ascending-sorted fold
    def sumAsc(m: Int): Expression =
      (m to 1 by -1).foldLeft(Literal(0.0d): Expression)((acc, i) =>
        Add(acc, slots(i - 1)))
    val a = CaseWhen((1 to k).map(m =>
      (EqualTo(nk, Literal(m.toLong)),
        Divide(sumAsc(m), Literal(m.toDouble)))), None)
    val ck = CaseWhen((1 to k).map(m =>
      (EqualTo(nk, Literal(m.toLong)), slots(m - 1))), None)
    CreateNamedStruct(Seq(
      Literal("a"), a, Literal("ck"), ck, Literal("nk"), nk))
  }
}

object KnnAMeanFold {
  /** The fold as a Column over a cosine Column. */
  def apply(cos: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      new KnnAMeanFold(org.apache.spark.sql.graft.Bridge.expression(cos), k)
        .toAggregateExpression())
}
