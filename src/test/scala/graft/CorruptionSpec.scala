package graft

import graft.corrupt.Corruption

class CorruptionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1, "x", 2.0)).toDF("custkey", "order_date", "price")

  test("positional rename produces attribute_{i} names") {
    assert(Corruption.positionalRename(df).columns.toSeq ==
      Seq("attribute_0", "attribute_1", "attribute_2"))
  }

  test("char noise is deterministic per (name, seed) and edits one position") {
    val a = Corruption.charNoise("order_date", seed = 1)
    val b = Corruption.charNoise("order_date", seed = 1)
    assert(a == b)
    // p=1.0 forces an edit on every name of length >= 2
    val edited = Corruption.charNoise("order_date", p = 1.0, seed = 1)
    assert(edited != "order_date")
    assert(math.abs(edited.length - "order_date".length) <= 1)
  }

  test("pool substitution draws from the pool deterministically") {
    val out1 = Corruption.poolSubstitution(df, Seq("aaa", "bbb"), p = 1.0)
    val out2 = Corruption.poolSubstitution(df, Seq("aaa", "bbb"), p = 1.0)
    assert(out1.columns.toSeq == out2.columns.toSeq)
    assert(out1.columns.forall(Set("aaa", "bbb").contains))
    // p=0 keeps everything
    assert(Corruption.poolSubstitution(df, Seq("aaa"), p = 0.0)
      .columns.toSeq == df.columns.toSeq)
  }
}
