package graft

import java.util.StringTokenizer

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.WordCount
import graft.sources.CorpusGenerator

class WordCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("golden fixture: reference-format corpus matches closed-form counts") {
    val files = 3; val lines = 100
    val corpus = CorpusGenerator.referenceCorpus(spark, files, lines).toDF("text")
    val got = WordCount.wordCount(corpus, "text").as[(String, Long)].collect().toMap
    val expected = CorpusGenerator.expectedCounts(files, lines)
    assert(got === expected)
    assert(got.values.sum === 13L * files * lines) // 13 tokens per line
  }

  test("tokenizer matches java.util.StringTokenizer on messy whitespace") {
    val rnd = new Random(42)
    val alphabet = "ab \t\n  c"
    val samples = Seq("", " ", "  a  b ", "\ta\nb\r c\f", "a") ++
      (1 to 200).map(_ => (1 to rnd.nextInt(20)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = samples.toDF("text")
      .select(WordCount.tokens(col("text")).as("toks"))
      .as[Seq[String]].collect()
    samples.zip(got).foreach { case (s, toks) =>
      val st = new StringTokenizer(s) // default delims: " \t\n\r\f"
      val exp = mutable.Buffer[String]()
      while (st.hasMoreTokens) exp += st.nextToken()
      assert(toks === exp.toSeq, s"input=${s.replace("\n", "\\n")}")
    }
  }

  test("topWords uppercases and tie-breaks by word after count desc") {
    val df = Seq("b a", "B A", "c").toDF("text")
    val top = WordCount.topWords(df, "text", 10).as[(String, Long)].collect().toSeq
    assert(top === Seq(("A", 2L), ("B", 2L), ("C", 1L)))
  }
}
