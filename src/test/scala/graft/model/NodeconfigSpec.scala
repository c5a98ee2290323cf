package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Accessor semantics + error messages of `helpers.go:9-94`. */
class NodeconfigSpec extends AnyFunSuite {

  private val c = Nodeconfig(Map(
    "port" -> "4321", "rate" -> "1.5", "name" -> "x", "bad" -> "zzz"))

  test("int: present, default, missing, unparseable, range") {
    assert(c.intConfig("port", 1) == Right(4321))
    assert(c.intConfig("nope", 7) == Right(7))
    assert(c.intConfigRequired("nope") == Left("missing config value [nope]"))
    assert(c.intConfigRequired("bad") == Left("expected integer value for config [bad]"))
    assert(c.intConfig("port", 1, 1, 100) ==
      Left("config value [port] requires value between [1] and [100]"))
  }

  test("string: present, default, missing") {
    assert(c.stringConfig("name", "d") == Right("x"))
    assert(c.stringConfig("nope", "d") == Right("d"))
    assert(c.stringConfigRequired("nope") == Left("missing config value [nope]"))
  }

  test("float64: present, default, unparseable, range") {
    assert(c.float64Config("rate", 0.0) == Right(1.5))
    assert(c.float64Config("nope", 2.5) == Right(2.5))
    assert(c.float64ConfigRequired("bad") == Left("expected float64 value for config [bad]"))
    assert(c.float64Config("rate", 0.0, 0.0, 1.0).isLeft)
  }

  test("bool with default") {
    assert(Nodeconfig(Map("f" -> "true")).boolConfig("f", default = false))
    assert(!Nodeconfig(Map.empty).boolConfig("f", default = false))
    assert(Nodeconfig(Map.empty).boolConfig("f", default = true))
  }
}
