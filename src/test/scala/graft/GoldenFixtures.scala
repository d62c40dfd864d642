package graft

import graft.dict.{Regions, TermIndex}
import graft.interpret.AddressInterpreter
import graft.link.Dict

/** Shared dictionary/trie instances for all suites (built once; the trie over
  * ~47.7k regions takes ~1s). */
object GoldenFixtures {
  lazy val dict: Dict = Dict.default()
  lazy val regions: Regions = dict.regions
  lazy val termIndex: TermIndex = dict.termIndex
  lazy val interpreter: AddressInterpreter = new AddressInterpreter(regions, termIndex)
}
