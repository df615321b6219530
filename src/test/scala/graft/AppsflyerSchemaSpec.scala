package graft

import graft.schema.AppsflyerSchema

class AppsflyerSchemaSpec extends SparkSpec {
  test("49 mapped columns (main.py:19-69)") {
    assert(AppsflyerSchema.mapping.size === 49)
    assert(AppsflyerSchema.sinkColumns.size === 49)
    assert(AppsflyerSchema.sinkColumns.distinct.size === 49,
      "reorder must be duplicate-free (reference reorder_cols bug fixed)")
  }
  test("campaignid directly after media_source (main.py:144-154 intent)") {
    val i = AppsflyerSchema.sinkColumns.indexOf("media_source")
    assert(AppsflyerSchema.sinkColumns(i + 1) === "campaignid")
  }
  test("7 datetime columns (main.py:81-85)") {
    assert(AppsflyerSchema.datetimeCols.size === 7)
    assert(AppsflyerSchema.datetimeCols.subsetOf(AppsflyerSchema.sinkColumns.toSet))
  }
  test("csv and sink orders are aligned") {
    val byCsv = AppsflyerSchema.mapping.toMap
    AppsflyerSchema.csvColumns.zip(AppsflyerSchema.sinkColumns).foreach {
      case (c, s) => assert(byCsv(c) === s)
    }
  }
}
