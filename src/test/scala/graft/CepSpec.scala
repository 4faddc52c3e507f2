package graft

import graft.flow.Cep
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Cep pattern→regex compiler: emitted subset, contiguity and
  * token-boundary semantics (via Java's engine — the oracle gate covers
  * RE2 agreement on the same strings). */
class CepSpec extends AnyFunSuite {

  private def m(pattern: String, path: String): Boolean =
    java.util.regex.Pattern.compile(Cep.compile(pattern)).matcher(path).find()

  test("literal chain matches contiguously, anywhere in the path") {
    assert(m("a>b", "a>b>c>"))
    assert(m("b>c", "a>b>c>"))
    assert(!m("a>c", "a>b>c>"), "contiguity: b between a and c must block")
  }

  test("token boundaries: no substring aliasing") {
    assert(!m("view", "preview>"), "token 'view' must not match 'preview'")
    assert(!m("pre", "preview>"), "prefix must not match a longer token")
    assert(m("preview", "preview>"))
  }

  test("quantifiers and alternation") {
    assert(m("a>(b|c)*>d", "a>d>"))
    assert(m("a>(b|c)*>d", "a>b>c>b>d>"))
    assert(!m("a>(b|c)*>d", "a>b>x>d>"))
    assert(m("a>b+>c", "a>b>b>c>"))
    assert(!m("a>b+>c", "a>c>"))
    assert(m("a>b?>c", "a>c>"))
  }

  test("wildcard token") {
    assert(m("a>.>c", "a>x>c>"))
    assert(!m("a>.>c", "a>c>"))
    assert(m("a>.*>c", "a>c>"))
    assert(m("a>.*>c", "a>x>y>c>"))
  }

  test("bad patterns fail loudly") {
    intercept[IllegalArgumentException](Cep.compile(""))
    intercept[IllegalArgumentException](Cep.compile("a>>b"))
    intercept[IllegalArgumentException](Cep.compile("a>"))
    intercept[IllegalArgumentException](Cep.compile("a>(b|)>c"))
    intercept[IllegalArgumentException](Cep.compile("a>B>c"))
    intercept[IllegalArgumentException](Cep.compile("a>b.c"))
  }
}
