package graft.dtype

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class DtypeSpec extends AnyFunSuite {

  test("simple dtypes parse and map") {
    assert(Dtype.parse("num") === Simple("num"))
    assert(Dtype.toSpark(Dtype.parse("num")) === DoubleType)
    assert(Dtype.toSpark(Dtype.parse("int")) === LongType)
    assert(Dtype.toSpark(Dtype.parse("str")) === StringType)
    assert(Dtype.toSpark(Dtype.parse("bool")) === BooleanType)
    assert(Dtype.toSpark(Dtype.parse("datetime")) === TimestampNTZType)
    assert(Dtype.toSpark(Dtype.parse("date")) === DateType)
  }

  test("cat dtypes: registry, field, union, nested filter") {
    assert(Dtype.parse("cat[ULabel]") === Cat(Seq(CatComponent("ULabel", None, None))))
    assert(Dtype.parse("cat[Gene.ensembl_gene_id]") ===
      Cat(Seq(CatComponent("Gene", Some("ensembl_gene_id"), None))))
    assert(Dtype.parse("cat[A|B]") ===
      Cat(Seq(CatComponent("A", None, None), CatComponent("B", None, None))))
    // nested-bracket filter survives (parse_nested_brackets semantics);
    // dotted module paths resolve to registry=bionty.Gene
    val f = Dtype.parse("cat[bionty.Gene.ensembl_gene_id[source__id='abc']]")
    assert(f === Cat(Seq(CatComponent("bionty.Gene", Some("ensembl_gene_id"),
      Some("source__id='abc'")))))
    assert(Dtype.toSpark(f) === StringType)
    assert(Dtype.parse("cat[bionty.Gene]") ===
      Cat(Seq(CatComponent("bionty.Gene", None, None))))
  }

  test("list dtypes") {
    assert(Dtype.parse("list[num]") === ListOf(Simple("num")))
    assert(Dtype.toSpark(Dtype.parse("list[int]")) === ArrayType(LongType))
    assert(Dtype.parse("list[cat[ULabel]]") ===
      ListOf(Cat(Seq(CatComponent("ULabel", None, None)))))
  }

  test("round-trip asString") {
    Seq("num", "list[num]", "cat[A|B]", "list[cat[ULabel]]").foreach { s =>
      assert(Dtype.parse(s).asString === s)
    }
  }

  test("splitTopLevel respects nesting depth") {
    assert(Dtype.splitTopLevel("A|B[x|y]|C", '|') === Seq("A", "B[x|y]", "C"))
  }

  test("value-type inference order (bool -> int -> num -> datetime -> str)") {
    assert(Dtype.infer(true) === Simple("bool"))
    assert(Dtype.infer(3) === Simple("int"))
    assert(Dtype.infer(3.5) === Simple("num"))
    assert(Dtype.infer("2024-01-01") === Simple("date"))
    assert(Dtype.infer("2024-01-01T00:00:00Z") === Simple("datetime"))
    assert(Dtype.infer("hello") === Simple("str"))
    assert(Dtype.infer(Map("a" -> 1)) === Simple("dict"))
    assert(Dtype.infer(Seq(1, 2)) === ListOf(Simple("int")))
  }

  test("invalid dtype raises") {
    intercept[IllegalArgumentException](Dtype.parse("nope"))
  }
}
