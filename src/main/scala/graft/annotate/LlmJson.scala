package graft.annotate

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON extraction from free-form LLM responses — the reference's
  * json_parser.extract_clean_json (SemanticAnnotation/json_parser.py:35–93):
  * prefer a ```json fenced block, else the outermost bare object, parse,
  * then recursively search for the dict holding the required annotation
  * keys {table_name, table_description, table_title, columns}.
  */
object LlmJson {

  /** The LLM annotation contract (SemanticAnnotation/config.py:23–52). */
  val annotationSchema: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("table_description", StringType),
    StructField("table_title", StringType),
    StructField("columns", MapType(StringType, StringType))))

  private val requiredKeys =
    Seq("table_name", "table_description", "table_title", "columns")

  /** Fast path: fenced/bare extraction + from_json (codegen-friendly). */
  def extractJsonText(c: Column): Column =
    when(c.rlike("```json"),
      regexp_extract(c, "```json\\s*([\\s\\S]*?)```", 1))
      .otherwise(regexp_extract(c, "(\\{[\\s\\S]*\\})", 1))

  /** Recursive fallback: depth-first search (json_parser.py:15–33) for the
    * first object containing every required key. Small Jackson UDF — runs
    * only over LLM responses (metadata volume), never the data path.
    */
  private val findAnnotationObject = F.udf { (text: String) =>
    if (text == null) null
    else {
      val mapper = new ObjectMapper()
      def search(node: JsonNode): Option[JsonNode] = {
        if (node == null) None
        else if (node.isObject && requiredKeys.forall(node.has)) Some(node)
        else if (node.isContainerNode)
          node.elements().asScala.flatMap(search(_).iterator).nextOption()
        else None
      }
      try search(mapper.readTree(text)).map(_.toString).orNull
      catch { case _: Exception => null }
    }
  }

  /** Full pipeline: raw LLM text column → parsed annotation struct
    * (null when no valid annotation object exists anywhere in the text).
    */
  def extractCleanJson(c: Column): Column = {
    val candidate = extractJsonText(c)
    val direct = from_json(candidate, annotationSchema)
    val rescued = from_json(findAnnotationObject(candidate), annotationSchema)
    when(direct.isNotNull && direct.getField("table_name").isNotNull, direct)
      .otherwise(rescued)
  }

  /** P12 validation (json_parser.py:80–83): annotation must map exactly the
    * expected number of columns.
    */
  def validColumnCount(parsed: Column, expected: Column): Column =
    size(map_keys(parsed.getField("columns"))) === expected
}
