package graft

import org.apache.spark.sql.functions._

import graft.annotate.{Canonicalize, Enrich, LlmJson, RuleAnnotator}
import graft.profile.Profiler

class AnnotateSpec extends SparkSpec {
  import spark.implicits._

  test("LlmJson extracts fenced, bare, and nested annotation objects") {
    val fenced =
      """Sure! Here is the annotation:
        |```json
        |{"table_name": "t1", "table_description": "d", "table_title": "T",
        | "columns": {"a": "alpha", "b": "beta"}}
        |```
        |Hope that helps.""".stripMargin
    val bare =
      """{"table_name": "t2", "table_description": "d2", "table_title": "T2",
        | "columns": {"x": "ex"}}""".stripMargin
    val nested =
      """{"response": {"result": {"table_name": "t3", "table_description": "d3",
        | "table_title": "T3", "columns": {"y": "why"}}}}""".stripMargin
    val junk = "I could not produce JSON, sorry."

    val out = Seq(fenced, bare, nested, junk).toDF("raw")
      .select(LlmJson.extractCleanJson(col("raw")).as("p"))
      .select(col("p.table_name"), col("p.columns")).collect()
    assert(out(0).getString(0) == "t1")
    assert(out(0).getMap[String, String](1)("a") == "alpha")
    assert(out(1).getString(0) == "t2")
    assert(out(2).getString(0) == "t3") // recursive rescue
    assert(out(3).isNullAt(0))
  }

  test("column-count validation (P12)") {
    val raw = """{"table_name":"t","table_description":"d","table_title":"T","columns":{"a":"x","b":"y"}}"""
    val df = Seq(raw).toDF("raw")
      .select(LlmJson.extractCleanJson(col("raw")).as("p"))
    assert(df.select(LlmJson.validColumnCount(col("p"), lit(2))).as[Boolean].head())
    assert(!df.select(LlmJson.validColumnCount(col("p"), lit(3))).as[Boolean].head())
  }

  test("canonicalization fold: first-seen term owns its synset") {
    val mapping = Canonicalize.foldCanonical(
      Seq("title", "name", "label", "custkey", "identifier", "id"))
    // 'title' seen first → canonical for {name, title, label}
    assert(mapping("title") == "title")
    assert(mapping("name") == "title")
    assert(mapping("label") == "title")
    // 'custkey' not in any synset → itself
    assert(mapping("custkey") == "custkey")
    // 'identifier' seen before 'id' → owns the id-group
    assert(mapping("identifier") == "identifier")
    assert(mapping("id") == "identifier")
  }

  test("bundled synonym dictionary: broad, unioned per term, fold-compatible") {
    val dict = Canonicalize.defaultSynonyms
    assert(dict.size > 400, s"dictionary too small: ${dict.size} terms")
    // schema-vocabulary groups beyond the original ten
    assert(dict("vendor").contains("supplier"))
    assert(dict("salary").contains("wage"))
    assert(dict("zipcode").contains("postcode"))
    // a term in several groups gets the UNION of its synsets
    assert(dict("amount").contains("price") && dict("amount").contains("total"))
    // fold semantics over new groups: vendor's unioned synset covers
    // {seller, merchant, retailer, supplier, provider, purveyor}, so the
    // first-seen "vendor" owns them all
    val m = Canonicalize.foldCanonical(Seq("vendor", "seller", "merchant", "supplier"))
    assert(m("vendor") == "vendor")
    assert(m("seller") == "vendor")
    assert(m("merchant") == "vendor")
    assert(m("supplier") == "vendor")
    // disjoint groups stay separate: student is nowhere near vendor
    val m2 = Canonicalize.foldCanonical(Seq("vendor", "student", "pupil"))
    assert(m2("student") == "student" && m2("pupil") == "student")
  }

  test("breadth expansion: general-English terms outside the schema core resolve") {
    val dict = Canonicalize.defaultSynonyms
    assert(dict.size > 1500, s"expanded dictionary too small: ${dict.size} terms")
    // general-English synsets from the breadth block
    assert(dict("comprehend").contains("understand"))
    assert(dict("contemplate").contains("ponder"))
    assert(dict("fathom").contains("grasp"))
    assert(dict("erroneous").contains("incorrect"))
    assert(dict("authenticate").contains("verify"))
    // multi-word / hyphenated entries are snake-normalized at load, the
    // same normalization annotations go through
    assert(dict("carry_on").contains("continue"))
    assert(dict("up_to_date").contains("modern"))
    // fold over breadth terms: first-seen owns the synset
    val m = Canonicalize.foldCanonical(Seq("fast", "quick", "rapid", "swift"))
    assert(m("quick") == "fast" && m("swift") == "fast")
    // breadth block 2: literary/advanced vocabulary beyond the earlier
    // blocks — terms that appeared in NO pre-existing group
    assert(dict.size > 2400, s"block-2 dictionary too small: ${dict.size} terms")
    assert(dict("sagacious").contains("wise"))
    assert(dict("ephemeral").contains("fleeting"))
    assert(dict("taciturn").contains("reticent"))
    assert(dict("zenith").contains("apex"))
    assert(dict("garrulous").contains("talkative"))
    assert(dict("parsimonious").contains("miserly"))
    val m2 = Canonicalize.foldCanonical(
      Seq("sagacious", "wise", "shrewd", "astute"))
    assert(m2("wise") == "sagacious" && m2("astute") == "sagacious")
  }

  test("WordNet wndb format: synsets parsed, markers stripped, header skipped") {
    // three synthetic data.noun lines in the documented wndb(5WN) shape:
    // offset lex_filenum ss_type w_cnt(hex) word lex_id ... p_cnt | gloss
    val lines = Seq(
      "  1 This software and database is a license header line",
      "00001740 03 n 02 car 0 automobile 0 001 @ 00001930 n 0000 | a motor vehicle",
      "00002000 00 a 03 fast(a) 0 quick 0 speedy 0 000 | moving rapidly",
      "00003000 03 n 01 singleton 0 000 | alone in its synset")
    val groups = Canonicalize.parseWordNetData(lines.iterator)
    assert(groups == Seq(Set("car", "automobile"),
      Set("fast", "quick", "speedy"))) // marker stripped; singleton dropped
    // groups feed the same fold as the bundled dictionary
    val merged = Canonicalize.foldCanonical(Seq("automobile", "car"),
      groups.flatMap(g => g.map(t => t -> (g - t)))
        .groupMapReduce(_._1)(_._2)(_ ++ _))
    assert(merged("car") == "automobile")
  }

  test("full WordNet database (activates when scripts/fetch_wordnet.sh has run)") {
    val dictDir = new java.io.File("data/wordnet/dict")
    assume(new java.io.File(dictDir, "data.noun").isFile,
      s"WordNet export not fetched (${dictDir.getPath}) — skipping")
    val dict = Canonicalize.loadWordNetDir(dictDir.getPath)
    // breadth: the reference's wordnet.synsets sees ~117k synsets /
    // ~150k words; the merged term map must be the same order of size
    assert(dict.size > 50000, s"WordNet dict suspiciously small: ${dict.size}")
    // known synset: car/auto/automobile (WordNet 3.0 noun 02958343)
    assert(dict("car").contains("automobile"))
    assert(dict("automobile").contains("car"))
    // and the fold behaves identically to the bundled-dictionary path
    val mapping = Canonicalize.foldCanonical(
      Seq("automobile", "car", "custkey"), dict)
    assert(mapping("car") == "automobile" && mapping("custkey") == "custkey")
  }

  test("canonicalizeAnnotations applies the mapping over the frame") {
    val ann = Seq(
      ("t1", "a", "title"), ("t1", "b", "name"), ("t2", "c", "custkey"))
      .toDF("table", "column", "semantic_annotation")
    val (out, mapping) = Canonicalize.canonicalizeAnnotations(ann)
    val got = out.select("semantic_annotation", "canonical_annotation")
      .as[(String, String)].collect().toMap
    assert(got("name") == "title" && got("title") == "title")
    assert(got("custkey") == "custkey")
    assert(mapping("name") == "title")
    // a NULL annotation passes through untouched — folded into the
    // literal map it would be a null map KEY, failing the first action
    val withNull = ann.unionByName(Seq(("t3", "d", null.asInstanceOf[String]))
      .toDF("table", "column", "semantic_annotation"))
    val (out2, mapping2) = Canonicalize.canonicalizeAnnotations(withNull)
    val rows2 = out2.select("semantic_annotation", "canonical_annotation")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows2.contains((null, null)), s"got ${rows2.toSeq}")
    assert(!mapping2.contains(null))
  }

  test("enrichment join overrides type to date and reformats the sample") {
    val profiles = Profiler.profileTable(
      Seq(("2023-01-15", 1)).toDF("o_orderdate", "k"), "orders")
    val ann = RuleAnnotator.annotate(profiles)
    val enriched = Enrich.enrichProfiles(profiles, ann)
      .filter(col("column") === "o_orderdate")
      .select("semantic_annotation", "enriched_type", "values_sample")
      .collect().head
    assert(enriched.getString(0) == "orderdate")
    assert(enriched.getString(1) == "date")
    assert(enriched.getAs[scala.collection.Seq[String]](2).head == "15 January 2023")
  }

  test("LLM prompt prep: dedup, seeded sample, null fill, markdown render") {
    val df = Seq(
      (Some(1), Some("x")), (Some(1), Some("x")), // dup row
      (Some(2), None), (Some(3), Some("z")))
      .toDF("a", "b")
    val sample = graft.annotate.LlmPrompt.prepareSample(df, numRows = 10, seed = 42)
    assert(sample.count() == 3) // dup collapsed
    assert(sample.filter(col("b").isNull).count() == 0) // nulls filled
    val prompt = graft.annotate.LlmPrompt.tablePrompt(df, "t1", numRows = 10)
    assert(prompt.contains("Table name: t1"))
    assert(prompt.contains("| a | b |"))
    assert(prompt.contains("| --- | --- |"))
    assert(prompt.contains("table_name, table_description, table_title, columns"))
    // deterministic
    assert(prompt == graft.annotate.LlmPrompt.tablePrompt(df, "t1", numRows = 10))
  }

  test("head-rows sample as string records (A4)") {
    val rows = graft.profile.Profiler.sampleRows(
      spark.read.parquet(s"$sf0001/region.parquet"), 3)
    assert(rows.size == 3)
    assert(rows.head.keySet == Set("r_regionkey", "r_name"))
  }

  test("missing annotation defaults to empty strings (reference intent, J2)") {
    val profiles = Profiler.profileStats(Seq((1, "x")).toDF("a", "b"), "t")
    val noAnn = spark.emptyDataFrame
      .select(lit("zz").as("table"), lit("zz").as("column"),
        lit("").as("table_title"), lit("").as("table_description"),
        lit("").as("semantic_annotation")).limit(0)
    val out = Enrich.enrichProfiles(profiles, noAnn)
    assert(out.filter(col("semantic_annotation") === "").count() == 2)
  }
}
