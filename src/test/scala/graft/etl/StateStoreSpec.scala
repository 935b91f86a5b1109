package graft.etl

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class StateStoreSpec extends AnyFunSuite {

  private def tmpState(): StateStore =
    new StateStore(Files.createTempDirectory("graft-state").resolve("state.json").toString)

  test("missing file loads as empty") {
    assert(tmpState().load() == Map.empty)
  }

  test("save/load roundtrip, archives sorted") {
    val st = tmpState()
    val state = Map(
      "alice" -> UserState(1753401600L, Vector("u2", "u1")),
      "bob"   -> UserState(0L, Vector.empty))
    st.save(state)
    val loaded = st.load()
    assert(loaded("alice").lastEndTime == 1753401600L)
    assert(loaded("alice").processedArchives == Vector("u1", "u2"))
    assert(loaded("bob") == UserState(0L, Vector.empty))
  }

  test("corrupt file loads as empty") {
    val dir = Files.createTempDirectory("graft-state")
    val p = dir.resolve("state.json")
    Files.writeString(p, "{not json")
    assert(new StateStore(p.toString).load() == Map.empty)
  }

  test("unmarkLatest pops the last processed archive per user") {
    val st = tmpState()
    val state = Map("alice" -> UserState(5L, Vector("a", "c", "b")))
    val popped = st.unmarkLatest(state)
    assert(popped("alice").processedArchives == Vector("a", "b"))
    assert(st.unmarkLatest(Map("x" -> UserState(0L, Vector.empty)))("x")
      .processedArchives.isEmpty)
  }
}
