package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Injectable LLM wire layer (SURVEY.md §2.10). The reference calls an
  * OpenAI-compatible HTTP API for chat completions (semantic annotation,
  * SemanticAnnotation/semantic_annotation.py:116–131) and embeddings
  * (SemLink/join_discoverer.py:161–165). The engine isolates that call
  * behind these traits so every operator is offline-testable with a fake
  * transport, and the production path is a drop-in.
  */
trait CompletionTransport extends Serializable {
  /** One prompt → completion round trip. Throw to signal a retryable
    * failure (network error, 5xx, malformed body).
    */
  def complete(prompt: String): String
}

trait EmbeddingTransport extends Serializable {
  /** One batched embeddings round trip: one vector per input, same order. */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Call policy mirroring the reference: a fixed throttle before every
  * attempt (`time.sleep(0.1)`, join_discoverer.py:244) and retry-once on
  * failure (semantic_annotation.py:198–205). After the final retry the
  * failure propagates — callers decide the fallback.
  *
  * `sleep` is injectable so specs can assert the throttle without wall
  * clock time.
  */
final case class LlmPolicy(
    throttleMs: Long = 100,
    retries: Int = 1,
    sleep: Long => Unit = Thread.sleep) extends Serializable {

  def call[T](f: => T): T = {
    var attempt = 0
    while (true) {
      sleep(throttleMs)
      try return f
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > retries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** OpenAI-compatible HTTP transport (the wire format the reference's
  * client library speaks — a public, widely-implemented API shape). One
  * instance per executor partition; the HttpClient is built lazily AFTER
  * deserialization.
  *
  * `apiKeyEnv` names an environment variable; the key itself never rides
  * in the task closure.
  */
final case class HttpLlmTransport(
    baseUrl: String,
    model: String,
    apiKeyEnv: String = "LLM_API_KEY",
    timeoutSec: Long = 60)
  extends CompletionTransport with EmbeddingTransport {

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()
  @transient private lazy val mapper = new ObjectMapper()

  private def post(path: String, body: String): String = {
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl$path"))
      .timeout(Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer ${sys.env.getOrElse(apiKeyEnv, "")}")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"LLM HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  /** Connectivity probe (reference: ollama_health_check.py — lists the
    * server's models and reports up/down). True iff `GET {baseUrl}/models`
    * answers 2xx; any connect/timeout/HTTP failure is DOWN, never a throw.
    */
  def healthCheck(): Boolean =
    try {
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"$baseUrl/models"))
        .timeout(Duration.ofSeconds(timeoutSec))
        .header("Authorization", s"Bearer ${sys.env.getOrElse(apiKeyEnv, "")}")
        .GET().build()
      client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() / 100 == 2
    } catch { case _: Exception => false }

  override def complete(prompt: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val msgs = root.putArray("messages")
    val m = msgs.addObject()
    m.put("role", "user")
    m.put("content", prompt)
    HttpLlmTransport.parseCompletion(mapper,
      post("/chat/completions", mapper.writeValueAsString(root)))
  }

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val in = root.putArray("input")
    texts.foreach(in.add)
    HttpLlmTransport.parseEmbeddings(mapper,
      post("/embeddings", mapper.writeValueAsString(root)), texts.length)
  }
}

object HttpLlmTransport {

  /** Strict wire-shape validation. A 2xx response with a malformed body
    * must THROW — [[LlmPolicy]]'s retry contract keys on exceptions, and
    * Jackson `path()` chains would otherwise yield ""/empty silently,
    * bypassing the retry and surfacing the failure later as an unrelated
    * `require()` in a downstream operator.
    */
  private[graft] def parseCompletion(mapper: ObjectMapper, body: String): String = {
    val content = mapper.readTree(body)
      .path("choices").path(0).path("message").path("content")
    if (!content.isTextual)
      throw new RuntimeException(
        s"LLM malformed completion body (no choices[0].message.content): ${body.take(200)}")
    content.asText()
  }

  private[graft] def parseEmbeddings(
      mapper: ObjectMapper, body: String, n: Int): Seq[Array[Float]] = {
    val data = mapper.readTree(body).path("data")
    if (!data.isArray || data.size() != n)
      throw new RuntimeException(
        s"LLM malformed embeddings body (data size ${data.size()}, expected $n): ${body.take(200)}")
    (0 until n).map { i =>
      val emb = data.path(i).path("embedding")
      if (!emb.isArray || emb.size() == 0)
        throw new RuntimeException(
          s"LLM malformed embeddings body (data[$i].embedding missing/empty): ${body.take(200)}")
      Array.tabulate(emb.size())(j => emb.path(j).floatValue())
    }
  }
}
