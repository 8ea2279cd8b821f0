package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger
import graft.users.UserService

/** User CRUD surface (reference utils/user.py:74–179) with injected
  * clock + id provider so every run is deterministic (F7).
  */
class UserSpec extends SparkSpec {

  private def service(): UserService = {
    val n = new AtomicInteger(0)
    new UserService(spark,
      Files.createTempDirectory("graft-users").toString,
      ids = () => s"uid-${n.incrementAndGet()}",
      clock = () => Timestamp.valueOf("2026-01-01 00:00:00"))
  }

  test("username validation (user.py:130–143)") {
    val s = service()
    assert(!s.validUsername(""))
    assert(!s.validUsername("ab"))
    assert(!s.validUsername("has space"))
    assert(!s.validUsername("a" * 51))
    assert(s.validUsername("alice.b-c_99"))
  }

  test("create, duplicate-reject, rate, stats") {
    val s = service()
    val id = s.createUser("alice", "a@example.com")
    assert(id === Some("uid-1"))
    assert(s.createUser("alice", "other@example.com") === None)
    assert(s.createUser("x", "bad") === None)
    s.addRating("uid-1", "tt0000001", 4.0f)
    s.addRating("uid-1", "tt0000002", 5.0f)
    val stats = s.userStats("uid-1").collect().head
    assert(stats.getAs[Long]("n_ratings") === 2)
    assert(stats.getAs[Double]("avg_rating") === 4.5)
    val recent = s.recentRatings("uid-1").collect()
    assert(recent.length === 2)
  }
}
