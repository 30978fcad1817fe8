package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 32-member MinHash signature of a
  * shingle array in ONE pass, no explode, no aggregate.
  *
  * Semantics are bit-identical to both existing constructions in this
  * codebase (pinned by StreamBatchEquivSuite):
  *   - batch (ops.Dedup): explode(sa) → h0 = xxhash64(s) →
  *     groupBy(min(xxhash64(i, h0)) for i < 32)
  *   - streaming HOF form: transform(sequence(0,31), m ->
  *     array_min(transform(sh, h -> xxhash64(m, h))))
  * because Spark's multi-arg xxhash64 is a seed CHAIN over XXH64
  * primitives: xxhash64(s) = hashUTF8String(s, 42); xxhash64(i, h0) =
  * hashLong(h0, hashInt(i, 42)). The per-member seeds hashInt(i, 42)
  * are constants, precomputed once; each shingle costs one string hash
  * plus `members` hashLong rounds — the same arithmetic the
  * explode+groupBy path pays, WITHOUT materializing |shingles|×members
  * rows or exchanging them for the min aggregate. The inner loop is
  * generated Java over primitive statics (zero boxing), inside
  * whole-stage codegen.
  *
  * Null semantics: a NULL array, an EMPTY array (no shingle → no min),
  * or any NULL element yields NULL — callers filter size(tok) >= k
  * before shingling, same contract as both existing paths.
  */
case class MinHashSigs(child: Expression, members: Int = 32)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sigs"

  /** Per-member seed: Spark's xxhash64(<int literal i>, h0) hashes the
    * int first against the base seed 42 — a constant per member. */
  private lazy val seeds: Array[Long] =
    Array.tabulate(members)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(members)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      val h0 = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < members) {
        val h = XXH64.hashLong(h0, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h0 = ctx.freshName("h0")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[${members}];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    long $h0 = $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |    for (int $i = 0; $i < ${members}; $i++) {
         |      long $h = $xxh.hashLong($h0, $seedsRef[$i]);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = new $gad($mins); }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
