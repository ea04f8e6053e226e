package graft.util

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {
  test("parseBool: permissive forms, error on junk") {
    for (s <- Seq("true", "T", " yes ", "Y", "1")) assert(Config.parseBool(s))
    for (s <- Seq("false", "F", "no", " N", "0")) assert(!Config.parseBool(s))
    intercept[IllegalArgumentException](Config.parseBool("ture"))
  }
  test("parseOpt: none-likes") {
    assert(Config.parseOpt("None").isEmpty)
    assert(Config.parseOpt("null").isEmpty)
    assert(Config.parseOpt("  ").isEmpty)
    assert(Config.parseOpt(" x ").contains("x"))
  }
  test("normalizePath: collapse duplicate slashes, keep scheme") {
    assert(Config.normalizePath("/a//b///c") == "/a/b/c")
    assert(Config.normalizePath("s3a://bucket//k///v") == "s3a://bucket/k/v")
    assert(Config.normalizePath("hdfs://nn/a//b") == "hdfs://nn/a/b")
  }
}
