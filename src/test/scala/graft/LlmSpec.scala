package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.annotate.LlmAnnotator
import graft.embed.LlmEmbedder
import graft.llm.{CompletionTransport, EmbeddingTransport, HttpLlmTransport, LlmPolicy}

/** Collectors live in a companion-style object: fake transports are
  * serialized into task closures, but in local mode the executor shares
  * the JVM, so static state observes the executor-side calls.
  */
object LlmSpecState {
  val completions = new ConcurrentLinkedQueue[String]()
  val failuresLeft = new AtomicInteger(0)
  val embedBatches = new ConcurrentLinkedQueue[Integer]()

  def reset(failFirst: Int = 0): Unit = {
    completions.clear(); embedBatches.clear(); failuresLeft.set(failFirst)
  }
}

/** Fake completion backend: optionally fails the first N calls (to drive
  * the retry path), then answers with a valid annotation JSON naming every
  * column `anno_<column>`.
  */
final case class FakeCompletion(garbageFor: Set[String] = Set.empty)
  extends CompletionTransport {
  override def complete(prompt: String): String = {
    LlmSpecState.completions.add(prompt)
    if (LlmSpecState.failuresLeft.getAndDecrement() > 0)
      throw new RuntimeException("transient backend failure")
    val table = prompt.linesIterator.next().stripPrefix("Table name: ")
    if (garbageFor(table)) "I could not produce the requested JSON, sorry."
    else {
      val cols = prompt.linesIterator
        .filter(l => l.startsWith("| ") && !l.contains("---") && !l.contains("| column |"))
        .map(_.split("\\|")(1).trim).toSeq
      val colJson = cols.map(c => s""""$c": "anno_$c"""").mkString(", ")
      s"""Here you go:
         |```json
         |{"table_name": "$table", "table_description": "desc of $table",
         | "table_title": "title of $table", "columns": {$colJson}}
         |```""".stripMargin
    }
  }
}

final case class FakeEmbedding(dim: Int) extends EmbeddingTransport {
  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    LlmSpecState.embedBatches.add(texts.length)
    texts.map(t => Array.tabulate(dim)(i => (t.length + i).toFloat))
  }
}

class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("LlmPolicy throttles before every attempt and retries once") {
    val sleeps = ArrayBuffer.empty[Long]
    val policy = LlmPolicy(throttleMs = 100, retries = 1, sleep = sleeps.append(_))
    var calls = 0
    val out = policy.call {
      calls += 1
      if (calls == 1) throw new RuntimeException("boom") else "ok"
    }
    assert(out == "ok")
    assert(calls == 2)                     // retry-once
    assert(sleeps.toSeq == Seq(100L, 100L)) // throttle precedes each attempt
  }

  test("LlmPolicy propagates after retries are exhausted") {
    val policy = LlmPolicy(throttleMs = 0, retries = 1, sleep = _ => ())
    var calls = 0
    intercept[RuntimeException] {
      policy.call { calls += 1; throw new RuntimeException("down") }
    }
    assert(calls == 2)
  }

  private def profilesDf = Seq(
    ("t1", "c_custkey", "integer"),
    ("t1", "c_name", "string"),
    ("t2", "o_orderdate", "datetime"))
    .toDF("table", "column", "inferred_type")

  test("LlmAnnotator: one call per table, parsed annotations at column grain") {
    LlmSpecState.reset()
    val ann = LlmAnnotator(FakeCompletion(), LlmPolicy(throttleMs = 0, sleep = _ => ()))
      .annotate(profilesDf)
      .orderBy("table", "column")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(ann.toSeq == Seq(
      ("t1", "title of t1", "desc of t1", "c_custkey", "anno_c_custkey"),
      ("t1", "title of t1", "desc of t1", "c_name", "anno_c_name"),
      ("t2", "title of t2", "desc of t2", "o_orderdate", "anno_o_orderdate")))
    assert(LlmSpecState.completions.size == 2) // one completion per TABLE
  }

  test("LlmAnnotator: transient failure is retried, then succeeds") {
    LlmSpecState.reset(failFirst = 1)
    val ann = LlmAnnotator(FakeCompletion(), LlmPolicy(throttleMs = 0, sleep = _ => ()))
      .annotate(profilesDf.filter(col("table") === "t2"))
      .collect()
    assert(ann.length == 1 && ann.head.getString(4) == "anno_o_orderdate")
    assert(LlmSpecState.completions.size == 2) // first call failed, retry hit
  }

  test("LlmAnnotator: invalid JSON falls back to rule-based naming") {
    LlmSpecState.reset()
    val ann = LlmAnnotator(FakeCompletion(garbageFor = Set("t1")),
        LlmPolicy(throttleMs = 0, sleep = _ => ()))
      .annotate(profilesDf)
      .orderBy("table", "column")
      .collect()
      .map(r => (r.getString(1), r.getString(3), r.getString(4)))
    assert(ann.toSeq == Seq(
      ("t1", "c_custkey", "custkey"),   // RuleAnnotator fallback
      ("t1", "c_name", "name"),
      ("title of t2", "o_orderdate", "anno_o_orderdate")))
  }

  test("LlmEmbedder: partition-batched embedding with bounded batch size") {
    LlmSpecState.reset()
    val docs = (1 to 10).map(i => (i.toLong, "x" * i)).toDF("id", "text")
      .repartition(1)
    val out = LlmEmbedder(FakeEmbedding(4), dim = 4,
        LlmPolicy(throttleMs = 0, sleep = _ => ()), batchSize = 4)
      .embedDataset(docs, "text")
    val got = out.select(col("id"), col("vec")).as[(Long, Array[Float])]
      .collect().toMap
    assert(got.size == 10)
    assert(got(3L).toSeq == Seq(3f, 4f, 5f, 6f)) // len + i
    val batches = LlmSpecState.embedBatches.toArray(Array.empty[Integer]).map(_.toInt)
    assert(batches.sorted.toSeq == Seq(2, 4, 4)) // 10 rows in batches of ≤4
  }

  test("LlmEmbedder.embed satisfies the per-string Embedder contract") {
    LlmSpecState.reset()
    val e = LlmEmbedder(FakeEmbedding(3), dim = 3,
      LlmPolicy(throttleMs = 0, sleep = _ => ()))
    assert(e.embed("abc").toSeq == Seq(3f, 4f, 5f))
    assert(e.embed(null).toSeq == Seq(0f, 1f, 2f))
  }

  test("malformed 2xx bodies throw so the retry-once contract applies") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    import graft.llm.HttpLlmTransport.{parseCompletion, parseEmbeddings}
    // well-formed bodies parse
    assert(parseCompletion(mapper,
      """{"choices":[{"message":{"content":"hi"}}]}""") == "hi")
    assert(parseEmbeddings(mapper,
      """{"data":[{"embedding":[1.0,2.0]}]}""", 1).head.toSeq == Seq(1f, 2f))
    // malformed 2xx bodies throw instead of yielding ""/empty
    intercept[RuntimeException](parseCompletion(mapper, """{"ok":true}"""))
    intercept[RuntimeException](parseCompletion(mapper,
      """{"choices":[{"message":{}}]}"""))
    intercept[RuntimeException](parseEmbeddings(mapper, """{"data":"x"}""", 1))
    intercept[RuntimeException](parseEmbeddings(mapper,
      """{"data":[{"embedding":[1.0]}]}""", 2)) // count mismatch
    intercept[RuntimeException](parseEmbeddings(mapper,
      """{"data":[{"embedding":[]}]}""", 1))    // empty vector
    // end to end: a transport whose 2xx body is garbage now drives the
    // policy's retry-once, then the failure propagates
    var calls = 0
    val policy = LlmPolicy(throttleMs = 0, retries = 1, sleep = _ => ())
    intercept[RuntimeException] {
      policy.call { calls += 1; parseCompletion(mapper, "{}") }
    }
    assert(calls == 2)
  }

  test("HttpLlmTransport builds without touching the network") {
    val t = HttpLlmTransport("http://localhost:9", "some-model")
    assert(t.baseUrl.nonEmpty && t.model == "some-model")
  }

  test("healthCheck reports DOWN (not a throw) when the server is unreachable") {
    // port 9 (discard) refuses immediately — no egress, deterministic
    val t = HttpLlmTransport("http://127.0.0.1:9", "some-model", timeoutSec = 2)
    assert(!t.healthCheck())
  }
}
