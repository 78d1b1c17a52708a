package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic attribute-projection façade: `dyn.foo` ≡ bag attrgetter
  * (core.py:62-69), lowered to Catalyst column projections. */
class DynDatasetSpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  private def df = Seq(("ada", 36, Seq(1, 2)), ("grace", 45, Seq(3, 4)))
    .toDF("name", "age", "xs")

  test("selectDynamic projects a column: dyn.name") {
    val d = DynDataset(df)
    assert(d.name.compute().toSet == Set("ada", "grace"))
    assert(d.age.compute().toSet == Set(36, 45))
  }

  test("apply(k) is item projection: dyn(\"age\"), nested dyn.xs(0)") {
    val d = DynDataset(df)
    assert(d("age").compute().toSet == Set(36, 45))
    assert(d.xs(0).compute().toSet == Set(1, 3))
  }

  test("elementwise operators on the focused column (35-dunder table)") {
    val d = DynDataset(df)
    assert(d.age.mapCol(_ * 2).compute().toSet == Set(72, 90))
    assert(d.age.mapCol(_ > 40).compute().toSet == Set(false, true))
    // direct operator sugar, incl. DynDataset rhs
    assert((d.age + 1).compute().toSet == Set(37, 46))
    assert((d.age % 2).compute().toSet == Set(0, 1))
    assert((d.age > 40).compute().toSet == Set(false, true))
    assert((d.age === d.age).compute().toSet == Set(true))
    assert((-d.age).compute().toSet == Set(-36, -45))
    assert((!(d.age > 40)).compute().toSet == Set(true, false))
  }

  test("struct field chaining") {
    val nested = df.select(struct(col("name"), col("age")).as("person"))
    val d = DynDataset(nested)
    assert(d.person.name.compute().toSet == Set("ada", "grace"))
  }
}
