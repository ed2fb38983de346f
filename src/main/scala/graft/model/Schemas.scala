package graft.model

/** Canonical internal record types shared by every graft operator.
  *
  * Derived from the reference's implicit schemas (SURVEY.md §1.4):
  * column profiles (reference: SchemaExtraction/extract_schema.py:40–77),
  * annotations (SemanticAnnotation/config.py:23–52), embeddings
  * (SemLink/join_discoverer.py:235–239), distance pairs and joinable pairs
  * (SemLink/join_discoverer.py:290–325).
  */
final case class ColumnProfile(
    table: String,
    column: String,
    inferredType: String, // one of integer | float | datetime | string
    rowCount: Long,
    nulls: Long,
    numValues: Long,
    minLen: Option[Int],
    maxLen: Option[Int],
    avgLen: Option[Double],
    valuesSample: Seq[String],
    mostCommonValues: Seq[String])

final case class Annotation(
    table: String,
    tableTitle: String,
    tableDescription: String,
    column: String,
    semanticAnnotation: String)

/** `columnName` is the `"table:column"` composite key
  * (reference: SemLink/join_discoverer.py:218, 321–322 — table names must
  * not contain `:`).
  */
final case class ColumnEmbedding(
    columnName: String,
    embedding: Array[Float],
    semanticAnnotation: String)

/** Distance is SQUARED L2 (FAISS IndexFlatL2 convention,
  * SemLink/join_discoverer.py:277–280); the square root is applied only at
  * the joinability-threshold filter (join_discoverer.py:318).
  */
final case class DistancePair(column1: String, column2: String, distanceAnns: Double)

final case class JoinablePair(
    t1: String, c1: String, t2: String, c2: String, distanceAnns: Double)

final case class EvalMetrics(
    tp: Long, fp: Long, fn: Long,
    precision: Double, recall: Double, f1: Double, ndcg: Double)
