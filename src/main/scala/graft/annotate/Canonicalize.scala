package graft.annotate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synonym canonicalization of semantic annotations — the reference's
  * WordNet pass (SemanticAnnotation/json_parser.py:95–209): for each new
  * term, look up its synonym set; the FIRST-SEEN term becomes canonical
  * for its whole synset; later terms matching an existing group map to
  * that canonical.
  *
  * This is an inherently order-dependent sequential fold (SURVEY.md §7.4)
  * — forced into a distributed op it would lose first-seen semantics. The
  * term vocabulary is metadata-sized, so the fold runs on the driver over
  * a deterministically ordered collect; application back to the
  * annotation frame is a broadcast map lookup (scales with data).
  *
  * For truly huge vocabularies the documented alternative is connected
  * components over the synonym graph via iterative min-label propagation
  * joins with lexicographic canonicals — same grouping, different (but
  * deterministic) canonical choice.
  */
object Canonicalize {

  /** Fallback groups if the bundled dictionary resource is missing. */
  private val builtinGroups: Seq[Set[String]] = Seq(
    Set("id", "identifier", "key", "code"),
    Set("name", "title", "label"),
    Set("date", "day", "time"),
    Set("price", "cost", "amount", "charge"),
    Set("quantity", "count", "number"),
    Set("description", "comment", "remark"),
    Set("address", "location", "place"),
    Set("balance", "credit"),
    Set("status", "state", "flag"),
    Set("type", "kind", "category", "class"))

  /** term → synset union across every group containing the term — the
    * shape `wordnet.synsets(term)` gives the reference (a term belongs to
    * ALL its synsets, json_parser.py:99–126).
    */
  private def mergeGroups(groups: Seq[Set[String]]): Map[String, Set[String]] =
    groups.flatMap(g => g.map(t => t -> (g - t)))
      .groupMapReduce(_._1)(_._2)(_ ++ _)

  /** Parse a synonym export: one comma-separated group per line,
    * `#` comments and blanks skipped, terms lowercased and snake-
    * normalized (spaces/hyphens → underscore) — the same normalization
    * annotations go through, so multi-word dictionary entries ("carry
    * on", "up-to-date") can actually match.
    */
  def parseSynonymGroups(lines: Iterator[String]): Seq[Set[String]] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split(",")
        .map(_.trim.toLowerCase.map(ch => if (ch == ' ' || ch == '-') '_' else ch))
        .filter(_.nonEmpty).toSet)
      .filter(_.size >= 2)
      .toSeq

  /** Parse a Princeton WordNet `data.{noun,verb,adj,adv}` file (the
    * wndb database format, publicly documented in wndb(5WN)): each
    * non-header line is one synset —
    *
    *   `offset lex_filenum ss_type w_cnt word lex_id [word lex_id...]
    *    p_cnt [ptr...] | gloss`
    *
    * — from which only the member words matter here (`w_cnt` is 2-digit
    * hex; words are underscore-joined; adjectives may carry a syntactic
    * marker suffix `(a)`/`(p)`/`(ip)`, stripped). License-header lines
    * start with two spaces. Words are lowercased; WordNet's own
    * underscore convention already matches the engine's snake
    * normalization. Single-word synsets carry no synonymy and are
    * dropped, exactly as [[parseSynonymGroups]] does.
    *
    * This is the full-breadth dictionary path the reference gets from
    * `wordnet.synsets` (json_parser.py:99–126, ~117k synsets): run
    * `scripts/fetch_wordnet.sh` in a connected deployment, then load
    * with [[loadWordNetDir]] and pass the result to
    * [[canonicalizeAnnotations]]. Without the files the bundled
    * ~800-group dictionary keeps working unchanged.
    */
  def parseWordNetData(lines: Iterator[String]): Seq[Set[String]] =
    lines.filterNot(l => l.isEmpty || l.startsWith("  "))
      .flatMap { line =>
        val f = line.split(" ")
        // f(0)=offset f(1)=lex_filenum f(2)=ss_type f(3)=w_cnt(hex)
        if (f.length < 5) None
        else {
          val wCnt =
            try Integer.parseInt(f(3), 16)
            catch { case _: NumberFormatException => 0 }
          // bound by the fields actually present: a line truncated
          // mid-download can carry a w_cnt its tail no longer has —
          // that is one corrupt synset, not a reason to crash the whole
          // ~10 MB dictionary load with a bare index error
          val have = math.min(wCnt, (f.length - 4) / 2)
          val words = (0 until have).map { i =>
            // words sit at f(4), f(6), f(8)… (each followed by lex_id)
            f(4 + 2 * i).toLowerCase
              .replaceAll("\\((a|p|ip)\\)$", "")
          }.filter(_.nonEmpty).toSet
          if (words.size >= 2) Some(words) else None
        }
      }.toSeq

  /** Load every `data.*` database file under a WordNet dict directory
    * (the layout `scripts/fetch_wordnet.sh` produces) into the term →
    * synset-union map [[canonicalizeAnnotations]] takes. All four POS
    * files are merged — the reference's `wordnet.synsets(term)` is
    * POS-blind too (json_parser.py:99).
    */
  def loadWordNetDir(dir: String): Map[String, Set[String]] = {
    val files = Seq("data.noun", "data.verb", "data.adj", "data.adv")
      .map(n => new java.io.File(dir, n)).filter(_.isFile)
    require(files.nonEmpty, s"no WordNet data.* files under $dir " +
      "(run scripts/fetch_wordnet.sh)")
    val groups = files.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try parseWordNetData(src.getLines()) finally src.close()
    }
    mergeGroups(groups)
  }

  /** Synonym dictionary standing in for WordNet (the corpus itself isn't
    * shippable offline; the reference consults `wordnet.synsets`,
    * json_parser.py:95–209): loaded from the bundled public-vocabulary
    * export `graft/synonyms.txt` (~800 curated groups: a schema-
    * vocabulary core plus a general-English breadth block), symmetric
    * closure + per-term union applied at load.
    */
  val defaultSynonyms: Map[String, Set[String]] = {
    val groups = Option(getClass.getResourceAsStream("/graft/synonyms.txt")) match {
      case Some(in) =>
        try parseSynonymGroups(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
        finally in.close()
      case None => builtinGroups
    }
    mergeGroups(groups)
  }

  /** The sequential first-seen fold (json_parser.py:146–188): returns
    * term → canonical for every input term.
    */
  def foldCanonical(
      termsInOrder: Seq[String],
      synonyms: Map[String, Set[String]] = defaultSynonyms): Map[String, String] = {
    // canonical -> members (canonical included)
    var groups = Vector.empty[(String, Set[String])]
    var mapping = Map.empty[String, String]
    termsInOrder.foreach { term =>
      if (!mapping.contains(term)) {
        groups.find { case (_, members) => members.contains(term) } match {
          case Some((canon, _)) =>
            mapping += term -> canon
          case None =>
            val synset = synonyms.getOrElse(term, Set.empty) + term
            groups :+= (term, synset)
            mapping += term -> term
        }
      }
    }
    mapping
  }

  /** Apply canonicalization to an annotation frame: collect the distinct
    * terms in deterministic first-seen order (table, column ascending —
    * the engine's defined scan order), fold on the driver, broadcast the
    * mapping back as a literal map lookup.
    * Returns (annotations with `canonical_annotation`, term → canonical).
    */
  def canonicalizeAnnotations(
      annotations: DataFrame,
      synonyms: Map[String, Set[String]] = defaultSynonyms)
      : (DataFrame, Map[String, String]) = {
    // NULL annotations carry no term to canonicalize — they pass through
    // the coalesce below untouched; folded into the literal map they
    // would be a null map KEY, failing the first action with an opaque
    // NULL_MAP_KEY error
    val terms = annotations
      .select("table", "column", "semantic_annotation")
      .orderBy("table", "column")
      .collect()
      .map(_.getString(2))
      .filter(_ != null)
      .toSeq
    val mapping = foldCanonical(terms, synonyms) // fold itself skips repeats
    val mapExpr = map(mapping.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val out = annotations.withColumn("canonical_annotation",
      coalesce(element_at(mapExpr, col("semantic_annotation")),
        col("semantic_annotation")))
    (out, mapping)
  }
}
