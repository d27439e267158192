package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by the query inventory.
  *
  * Determinism doctrine (oracle hash-compare, SURVEY §7.5): every numeric
  * output must be bit-identical between Spark and the DuckDB oracle, so
  *  - double SUM/AVG go through exact DECIMAL accumulation (order-free),
  *    then one cast back to double (exact while the scaled sum < 2^53);
  *  - float vector math is quantized to integer microunits (×1e6) so dot
  *    products and norms are exact integer sums in both engines;
  *  - hashing is md5 (identical in Spark and DuckDB), consumed either as a
  *    hex-string prefix or via conv(hex,16,10) — never engine-native hash().
  */
object ColFns {

  /** Order-independent exact sum of a 2-decimal double column, as double. */
  def decSum2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Order-independent exact sum of a 4-decimal product column, as double. */
  def decSum4(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Quantize a float-array embedding to integer microunits. Exact and
    * identical in both engines (same double rounding, ties impossible for
    * generated float data). Backed by the codegen'd [[QuantizeVec]]
    * expression since round 19 — the `transform(...)` HOF form evaluates
    * interpreted (no codegen for higher-order functions) inside the scan
    * stage of every similarity/embedding query; VecOpsSpec pins equality. */
  def quantizeVec(c: Column): Column = VecOps.quantizeVec(c, 1000000d)

  /** Millunit (×1e3) variant — the IVF/PQ/semdedup working scale (squared
    * sums must stay within BIGINT). Same codegen'd expression. */
  def quantizeVecMilli(c: Column): Column = VecOps.quantizeVec(c, 1000d)

  /** Exact integer dot product of two quantized vectors (scale 1e12).
    * Backed by the codegen'd QDotProduct expression — the declarative
    * `aggregate(zip_with(...))` form is interpreted (no codegen for
    * higher-order functions) and was the all-pairs scan bottleneck. */
  def qdot(a: Column, b: Column): Column = QDotOps.qdotNative(a, b)

  /** Exact integer squared norm of a quantized vector (scale 1e12). */
  def qnorm2(a: Column): Column = QDotOps.qdotNative(a, a)

  /** Exact FLOOR division of a long column by a positive long constant —
    * the calendar-correct bucketing semantics (a pre-1970 timestamp
    * floors to the PREVIOUS day, matching date_trunc) for EVERY sign of
    * the dividend; Spark's `div` truncates toward zero and would land
    * negative epochs one bucket high (round-11 ADVICE; the inverted
    * index's shiftright fix is the power-of-two special case). NB both
    * engines' native integer division TRUNCATES (DuckDB `//` measured:
    * −7 // 2 = −3), so oracle SQL must spell the floor out too — either
    * date_trunc on the calendar path or (x − pmod(x, b)) // b, which is
    * exactly divisible so truncation and floor agree. Stays in exact
    * integer arithmetic — `floor(a / b)` over doubles would lose bits
    * past 2^53, which nanos epochs (~1.7e18) exceed. pmod is
    * non-negative, so a − pmod(a, b) is the largest multiple of
    * b ≤ a and the div is exact. */
  def floorDiv(c: Column, b: Long): Column = {
    require(b > 0, s"floorDiv divisor must be positive, got $b")
    floorDiv(c, lit(b))
  }

  /** Column-divisor overload (divisor must be positive; e.g. a group
    * count). Same exact-integer floor semantics as the constant form.
    * The positivity contract is RUNTIME-enforced (round-12 ADVICE: the
    * constant overload fails fast via require, but a zero/negative
    * column divisor would make (x − pmod(x, b))/b silently wrong or
    * null) — the guard branch is constant-foldable when b is provably
    * positive and costs one comparison otherwise. */
  def floorDiv(c: Column, b: Column): Column =
    when(b > lit(0), call_function("div", c - pmod(c, b), b))
      .otherwise(raise_error(
        // coalesce: a NULL divisor also lands here (b > 0 is null), and
        // concat(..., null) would null the whole message — raise_error
        // with a null message surfaces as an opaque failure instead of
        // this diagnostic (round-13 ADVICE).
        concat(lit("floorDiv divisor must be positive, got "),
          coalesce(b.cast("string"), lit("null")))))

  /** Seconds-precision epoch of a long-nanos timestamp column. Floor
    * division ([[floorDiv]]): the oracle side is
    * epoch(date_trunc('second', ts)), which FLOORS for pre-1970
    * timestamps — integer `div` would truncate toward zero and diverge
    * one second high on every negative epoch. Must stay integer
    * arithmetic: `/` on longs is double division, and nanos since epoch
    * (~1.7e18) exceeds a double's 53-bit mantissa. */
  def nsToEpochSec(c: Column): Column = floorDiv(c, 1000000000L)

  /** Hour-bucket epoch (seconds) of a long-nanos timestamp column. */
  def nsToHourEpoch(c: Column): Column =
    floorDiv(c, 3600L * 1000000000L) * 3600L

  /** First 8 hex chars of md5 as a non-negative long (32-bit range).
    * DuckDB equivalent: CAST('0x' || substring(md5(x),1,8) AS BIGINT). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Normalized-text digest shared by the whole exact-dedup family
    * (dedup_exact, dedup_exact_group_sizes, pipeline_clean_corpus, the
    * streaming doc pipeline): md5(lower(trim(text))). One definition so
    * a future normalization change cannot silently diverge between
    * sites. DuckDB: md5(LOWER(TRIM(text))). */
  def normDigest(c: Column): Column = md5(lower(trim(c)))

  /** Whitespace tokenization shared with the oracle: split on single
    * spaces, drop empties. DuckDB: string_split(text, ' ') + filter.
    * Backed by the codegen'd [[SpaceWords]] expression since round 18 —
    * the `filter(split(...))` HOF form evaluates interpreted (no codegen
    * for higher-order functions) and tokenization sits in the single-task
    * scan stage of most text/dedup queries; TextOpsSpec pins equality. */
  def words(c: Column): Column = TextOps.spaceWords(c)

  /** Word 3-grams ("shingles") of a words array. Caller must ensure
    * size(words) >= 3 (below that the codegen'd [[NgramsConcat]] returns
    * an empty array; the previous HOF form was undefined there, so the
    * precondition is unchanged). One codegen'd pass since round 18 — see
    * [[words]]; TextOpsSpec pins equality against the HOF form. */
  def shingles3(w: Column): Column = TextOps.ngramsConcat(w, 3)

  /** First 15 hex chars of md5 as a non-negative long (60-bit range) —
    * the portable "big" hash. DuckDB: CAST('0x' || substring(md5(x),1,15)
    * AS BIGINT). */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Guarded 32-bit id for the 8-byte pair pack (shiftleft(a,32)+b):
    * passes ids in [0, 2³²) through unchanged and RAISES on anything
    * wider — the pack is only injective inside that domain, and a silent
    * out-of-domain id would collide packed keys (dropping pairs from a
    * distinct) instead of failing. One codegen'd branch per input row.
    * Beyond 2³² ids the caller switches to the two-column struct pack —
    * a documented re-parameterization, never a silent one. */
  def packableId(c: Column): Column =
    when(c >= 0L && c < lit(1L << 32), c)
      .otherwise(raise_error(concat(
        lit("vec_id outside the 32-bit pack domain: "),
        c.cast("string"))).cast("long"))

  /** Pack a non-negative id pair (each < 2³², enforce via [[packableId]]
    * upstream) into one long — halves distinct/shuffle row width on
    * pair-scale stages. */
  def packPair(a: Column, b: Column): Column = shiftleft(a, 32) + b

  /** Unpack [[packPair]] — the UNSIGNED shift matters: for a ≥ 2³¹ the
    * packed key's sign bit is set and an arithmetic shift would sign-
    * extend garbage into the upper id. */
  def unpackPairA(pk: Column): Column = shiftrightunsigned(pk, 32)
  def unpackPairB(pk: Column): Column = pk.bitwiseAND(lit(0xFFFFFFFFL))

  /** Sign-LSH hyperplane p's 64 weights, precomputed driver-side — data
    * independent. Shared by SimilarityQueries and DedupQueries embedding
    * blocking. md5-based so the directions are isotropic: the earlier LCG
    * construction made consecutive weights differ by a constant (a
    * sawtooth), which correlated all hyperplanes and measured only ~0.5
    * recall. MUST stay formula-identical to the oracle SQL:
    * CAST('0x' || substring(md5(p || ':' || d), 1, 4) AS INTEGER) − 32768. */
  def lshWeights(p: Int): Array[Long] = Array.tabulate(64) { d =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val h2 = md.digest(s"$p:$d".getBytes("UTF-8")).take(2)
    (((h2(0) & 0xFF) << 8) | (h2(1) & 0xFF)).toLong - 32768L
  }

}
