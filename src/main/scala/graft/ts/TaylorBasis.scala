package graft.ts

import graft.linalg.Linalg

/** Closed-form machinery for windowed Taylor-polynomial fits
  * (reference featurize.py:300 taylor_coefs_one_column_grp).
  *
  * Key insight exploited throughout: the least-squares design matrix
  * depends only on the window SHAPE (lags, degree, weights), never on
  * the data. So `beta = pinv(W^½X) · W^½ y` is a FIXED linear
  * combination of the windowed values — each coefficient is a constant-
  * weighted sum of lag/lead columns, i.e. pure whole-stage-codegen
  * arithmetic after one partition sort. The same weight tables drive
  * both the Spark Column expressions and the DuckDB oracle SQL, making
  * the two engines bit-identical by construction.
  *
  * Edge semantics replicate the reference exactly (verified against it
  * empirically):
  *  - trailing: interior is 0-based pos ≥ w; with fill_edges, pos=i<w
  *    refits on lags (1-i)..0 (i rows; empty system at pos=0 → all-zero
  *    coefficients, numpy lstsq's min-norm answer).
  *  - centered (h=(w-1)/2): interior is h ≤ pos ≤ n-h-2; pos = n-h-1 is
  *    NEVER filled (reference off-by-one); with fill_edges, left edge
  *    pos=i<h refits on lags -i..h, right edge rpos=i<h on lags -h..i.
  *  - ew_span: alpha = 2/(span+0.1) (the reference's literal formula),
  *    weights alpha·(1-alpha)^|lag| normalized over the FULL window and
  *    then sliced (not renormalized) for edge windows.
  */
object TaylorBasis {

  /** One CASE branch: when `cond` holds, coefficient d is
    * Σ_j m(d)(j) · value(t + lags(j)), or NULL when nullRows(d).
    */
  sealed trait Cond
  case object Interior extends Cond
  final case class PosEq(i: Int) extends Cond
  final case class RposEq(i: Int) extends Cond
  /** rpos == h for centered align: reference leaves it NaN even with
    * fill_edges — but ONLY for rows that are not left edges (pos >= h);
    * in groups shorter than the window the left-edge fill covers it, so
    * this branch is ordered after the PosEq branches.
    */
  final case class NullAt(rpos: Int) extends Cond
  /** pos < h && rpos < h (groups shorter than the window): the row is
    * both a left and a right edge; either fit's y-slice has missing
    * data, and numpy lstsq over NaN yields all-NaN (verified
    * empirically against the reference — TaylorShortGroupSpec).
    */
  case object Overlap extends Cond

  final case class Branch(cond: Cond, lags: Array[Int], m: Array[Array[Double]], nullRows: Array[Boolean])

  final case class Spec(
      column: String,
      degree: Int,
      windowSize: Int,
      align: String, // "centered" | "trailing"
      ewSpan: Option[Int],
      fillEdges: Boolean) {
    require(align == "centered" || align == "trailing", s"bad align $align")
    // centered lags are -(w-1)/2..(w-1)/2 — an even w would silently
    // fit a (w-1)-wide window (the reference crashes on the shape
    // mismatch); fail fast instead
    require(align != "centered" || windowSize % 2 == 1,
      s"centered taylor windows must be odd, got $windowSize")
    def featName(d: Int): String =
      s"${column}_taylor_d${degree}_c${d}_w$windowSize${align.head}_s${ewSpan.map(_.toString).getOrElse("None")}"
    def needsCount: Boolean = align == "centered"
  }

  def windowLags(w: Int, align: String): Array[Int] = align match {
    case "centered" => val h = (w - 1) / 2; (-h to h).toArray
    case "trailing" => (-(w - 1) to 0).toArray
  }

  /** Normalized exponential observation weights over the full window. */
  def ewWeights(lags: Array[Int], ewSpan: Option[Int]): Array[Double] = ewSpan match {
    case None => Array.fill(lags.length)(1.0)
    case Some(span) =>
      val alpha = 2.0 / (span + 0.1)
      val raw = lags.map(l => alpha * math.pow(1.0 - alpha, math.abs(l)))
      val tot = raw.sum
      raw.map(_ / tot)
  }

  /** Coefficient matrix for a contiguous row-slice [from, until) of the
    * (weighted) design matrix: M such that beta = M · values(lags).
    */
  private def sliceM(spec: Spec, lags: Array[Int], weights: Array[Double], from: Int, until: Int): Array[Array[Double]] = {
    val sub = (from until until).toArray
    val sqrtW = sub.map(j => math.sqrt(weights(j)))
    // rows of W^½ X for the slice
    val x = sub.zipWithIndex.map { case (j, r) =>
      val l = lags(j).toDouble
      Array.tabulate(spec.degree + 1)(d => sqrtW(r) * math.pow(l, d) / factorial(d))
    }
    val p = Linalg.pinv(x) // (degree+1) × slice
    // fold the y-side weighting into the matrix: beta = P · diag(sqrtW) · y
    Array.tabulate(spec.degree + 1, sub.length)((d, j) => p(d)(j) * sqrtW(j))
  }

  private def factorial(d: Int): Double = (1 to d).foldLeft(1.0)(_ * _)

  /** Ordered CASE branches (first match wins), replicating the
    * reference's final beta_hat cell-for-cell INCLUDING groups shorter
    * than the window and the ew_span NaN-contamination quirk — all
    * verified against the reference itself in TaylorShortGroupSpec:
    *
    *  - Overlap (pos<h && rpos<h, only possible when n < w): both
    *    candidate edge fits solve a system with missing data → the
    *    reference's lstsq returns NaN → NULL.
    *  - Left edges (pos == i < h) INCLUDING rows whose rpos == h: in
    *    short groups the left-edge fill covers the "never-filled"
    *    position, so PosEq precedes NullAt.
    *  - NullAt(h): rpos == h with pos >= h — never written by the
    *    reference (its centered interior slice stops one short).
    *  - Right edges, then interior.
    *
    * ew_span quirk (reference featurize.py:381-386): `y = W½ · y` is a
    * full matrix product, so 0·NaN turns EVERY entry of a y column NaN
    * whenever the row's FULL window extends past the group — even
    * entries the edge sub-fit would use. LAPACK's min-norm solve of the
    * all-NaN system returns NaN per coefficient except where the pinv
    * row is structurally zero (exactly 0.0 there). Consequently, with
    * ew_span set, an edge fit is only real when the full window is
    * complete (trailing pos == w-1); all other filled edges emit NULL,
    * or 0.0 for structurally-zero pinv rows.
    */
  def branches(spec: Spec): Seq[Branch] = {
    val w = spec.windowSize
    val lags = windowLags(w, spec.align)
    val weights = ewWeights(lags, spec.ewSpan)
    def slice(from: Int, until: Int) = sliceM(spec, lags, weights, from, until)
    val noNull = Array.fill(spec.degree + 1)(false)
    val allNull = Array.fill(spec.degree + 1)(true)
    val mEmpty = Array.fill(spec.degree + 1)(Array.empty[Double])
    // NaN-contaminated edge fit: NULL per coefficient unless the pinv
    // row is structurally zero (→ exact 0.0). 1e-12 separates pinv's
    // O(1) genuine entries from numerical zeros.
    def ewEdge(cond: Cond, from: Int, until: Int): Branch = {
      val m = slice(from, until).map(_.map(v => if (math.abs(v) < 1e-12) 0.0 else v))
      Branch(cond, lags.slice(from, until), m, m.map(row => row.nonEmpty && row.exists(_ != 0.0)))
    }
    spec.align match {
      case "trailing" =>
        val edges =
          if (!spec.fillEdges) Nil
          else (0 until w).map { i =>
            // rows (w-i)..(w-1) → lags (1-i)..0; i=0 is the empty system → zeros
            if (spec.ewSpan.isDefined && i < w - 1) ewEdge(PosEq(i), w - i, w)
            else Branch(PosEq(i), lags.slice(w - i, w), slice(w - i, w), noNull)
          }
        edges :+ Branch(Interior, lags, slice(0, w), noNull)
      case "centered" =>
        val h = (w - 1) / 2
        val never = Branch(NullAt(h), Array.empty, mEmpty, allNull)
        if (!spec.fillEdges)
          Seq(never, Branch(Interior, lags, slice(0, w), noNull))
        else {
          val overlap = Branch(Overlap, Array.empty, mEmpty, allNull)
          val lefts = (0 until h).map { i =>
            if (spec.ewSpan.isDefined) ewEdge(PosEq(i), h - i, w)
            else Branch(PosEq(i), lags.slice(h - i, w), slice(h - i, w), noNull)
          }
          val rights = (0 until h).map { i =>
            if (spec.ewSpan.isDefined) ewEdge(RposEq(i), 0, h + i + 1)
            else Branch(RposEq(i), lags.slice(0, h + i + 1), slice(0, h + i + 1), noNull)
          }
          ((overlap +: lefts) :+ never) ++ rights :+ Branch(Interior, lags, slice(0, w), noNull)
        }
    }
  }
}
