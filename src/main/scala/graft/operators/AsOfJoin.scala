package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the most recent right
  * row with the same key and right.time ≤ left.time — the standard
  * time-series enrichment operator (absent from both the reference and
  * stock Spark).
  *
  * Implementation is the union-sort composition (preference (a) from the
  * build rules — no custom physical operator needed): tag both sides,
  * union, and run one window pass per key ordered by (time, side-tag,
  * tiebreak), carrying the last-seen right payload forward. Cost: ONE
  * shuffle on the key + an in-partition sort — never the key-range
  * explosion of a naive `left.time >= right.time` theta join. Ties:
  * right rows sort before left rows at equal time (inclusive ≤), equal
  * right times resolve by the caller's tiebreak column, so output is
  * deterministic.
  *
  * Scale notes: state per key is a single "last right payload" struct
  * inside the window — memory ∝ 1 per key, and the shuffle moves each
  * row once. Skewed keys are split by AQE like any other sort window.
  */
object AsOfJoin {

  /** Internal column names of the union-sort composition. An input frame
    * already carrying one of these would silently shadow the tagged
    * columns (or fail later with an ambiguous-reference error), so each
    * entry point rejects the names IT uses up front — the same
    * reserved-name contract [[RangeJoin.keyedBand]] enforces for
    * `_rj_bin`. Per-direction sets (not one blanket list) because
    * [[joinAsOfNearest]] legitimately pipes the backward output — which
    * carries `_asof` — into the forward pass. */
  private val tagCols = Seq("_k", "_t", "_side", "_tb", "_payload")

  private def requireNoReserved(left: DataFrame, right: DataFrame,
                                outCols: String*): Unit = {
    val clash = (tagCols ++ outCols).filter(r =>
      left.columns.contains(r) || right.columns.contains(r))
    require(clash.isEmpty,
      s"inputs must not contain the reserved column name(s) " +
        clash.mkString(", "))
  }

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param key       equi-join key column name present on both sides
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param rightTiebreak right column that totally orders equal times
    * @param payload   right columns to attach (prefixed `asof_`)
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightTiebreak: String, payload: Seq[String]): DataFrame = {
    requireNoReserved(left, right, "_asof")
    // the tiebreak is cast to long for the sort — fractional types would
    // truncate (equal-time rows differing only in the fraction become
    // indistinguishable, breaking the determinism guarantee, and ANSI
    // mode throws on out-of-range doubles), so only integral types are
    // accepted
    import org.apache.spark.sql.types._
    val tbType = right.schema(rightTiebreak).dataType
    val integral = tbType == ByteType || tbType == ShortType ||
      tbType == IntegerType || tbType == LongType
    require(integral,
      s"rightTiebreak '$rightTiebreak' must be an integral type " +
        s"(byte/short/int/long), got " + tbType.catalogString)
    val leftCols = left.columns
    val payloadStruct = struct(
      (Seq(rightTime, rightTiebreak) ++ payload).distinct.map(col): _*)

    val taggedRight = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      col(rightTiebreak).cast("long").as("_tb"),
      payloadStruct.as("_payload"))
    val taggedLeft = left.select(
      (leftCols.map(col) :+
        col(key).as("_k") :+ col(leftTime).as("_t") :+ lit(1).as("_side") :+
        lit(Long.MaxValue).as("_tb") :+
        lit(null).cast(taggedRight.schema("_payload").dataType)
          .as("_payload")): _*)

    val unioned = taggedRight
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("_k"), col("_t"), col("_side"), col("_tb"),
          col("_payload"))): _*)
      .union(taggedLeft)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col("_asof"): _*)
  }

  /** FORWARD as-of join: the EARLIEST right row with the same key and
    * right.time ≥ left.time (pandas `merge_asof(direction='forward')`).
    * Same union-sort composition as [[joinAsOf]] with the scan reversed:
    * one descending window pass carries the nearest-later right payload
    * backward onto each left row. Ties at equal time are inclusive;
    * equal right times resolve to the SMALLEST tiebreak (the mirror of
    * backward's largest-wins, so both directions stay deterministic).
    * Output column: `_asof_fwd`. Cost identical to backward: one key
    * shuffle + in-partition sort, last-payload state per key. */
  def joinAsOfForward(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightTiebreak: String, payload: Seq[String]): DataFrame = {
    requireNoReserved(left, right, "_asof_fwd")
    import org.apache.spark.sql.types._
    val tbType = right.schema(rightTiebreak).dataType
    val integral = tbType == ByteType || tbType == ShortType ||
      tbType == IntegerType || tbType == LongType
    require(integral,
      s"rightTiebreak '$rightTiebreak' must be an integral type " +
        s"(byte/short/int/long), got " + tbType.catalogString)
    val leftCols = left.columns
    val payloadStruct = struct(
      (Seq(rightTime, rightTiebreak) ++ payload).distinct.map(col): _*)
    val taggedRight = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      col(rightTiebreak).cast("long").as("_tb"),
      payloadStruct.as("_payload"))
    val taggedLeft = left.select(
      (leftCols.map(col) :+
        col(key).as("_k") :+ col(leftTime).as("_t") :+ lit(1).as("_side") :+
        lit(Long.MinValue).as("_tb") :+
        lit(null).cast(taggedRight.schema("_payload").dataType)
          .as("_payload")): _*)
    val unioned = taggedRight
      .select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("_k"), col("_t"), col("_side"), col("_tb"),
          col("_payload"))): _*)
      .union(taggedLeft)
    // descending time: right rows at equal time scan BEFORE left rows
    // (inclusive ≥); among equal right times the last-seen (carried)
    // row is the smallest tiebreak
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side"), col("_tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof_fwd", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col("_asof_fwd"): _*)
  }

  /** NEAREST as-of join (pandas `direction='nearest'`): whichever of the
    * backward and forward matches is closer in time; exact ties go to
    * the BACKWARD match (pandas' rule). Composition of the two
    * directional passes — two key shuffles total, no theta join. The
    * caller supplies `timeDistance(leftTime, rightTime)` so calendar
    * types and numerics both work; it must be non-negative and
    * symmetric. Output column: `_asof_near`. */
  def joinAsOfNearest(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightTiebreak: String, payload: Seq[String])(
      timeDistance: (Column, Column) => Column): DataFrame = {
    requireNoReserved(left, right, "_asof", "_asof_fwd", "_asof_near")
    val leftCols = left.columns
    val back = joinAsOf(left, right, key, leftTime, rightTime,
      rightTiebreak, payload)
    val both = joinAsOfForward(back, right, key, leftTime, rightTime,
      rightTiebreak, payload)
    val db = timeDistance(col(leftTime), col("_asof")(rightTime))
    val df_ = timeDistance(col(leftTime), col("_asof_fwd")(rightTime))
    both.withColumn("_asof_near",
        when(col("_asof").isNull, col("_asof_fwd"))
          .when(col("_asof_fwd").isNull, col("_asof"))
          .when(df_ < db, col("_asof_fwd"))
          .otherwise(col("_asof")))
      .select(leftCols.map(col) :+ col("_asof_near"): _*)
  }
}
