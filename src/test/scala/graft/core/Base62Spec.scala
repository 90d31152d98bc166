package graft.core

import org.scalatest.funsuite.AnyFunSuite

class Base62Spec extends AnyFunSuite {
  private val rnd = new scala.util.Random(12345)

  test("alphabet orders digits < uppercase < lowercase") {
    assert(Base62.Alphabet === "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
    assert(Base62.decode("Z") < Base62.decode("a")) // the collation trap
  }

  test("encode/decode round-trip (randomized)") {
    (1 to 500).foreach { _ =>
      val n = rnd.nextLong(62L * 62 * 62 * 62)
      assert(Base62.decode(Base62.encode(n, 4)) === n)
    }
  }

  test("increment is monotone in decoded space across the Z->a boundary") {
    assert(Base62.increment("0000") === "0001")
    assert(Base62.increment("000z") === "0010")
    assert(Base62.increment("000Z") === "000a")
    (1 to 500).foreach { _ =>
      val n = rnd.nextLong(62L * 62 * 62 * 62 - 1)
      val s = Base62.encode(n, 4)
      assert(Base62.decode(Base62.increment(s)) === n + 1)
    }
  }

  test("deterministic uid generation under a fixed seed") {
    val a = Base62.randomWith(20, new java.util.Random(42))
    val b = Base62.randomWith(20, new java.util.Random(42))
    assert(a === b)
    assert(a.length === 20)
    assert(a.forall(Base62.Alphabet.contains(_)))
  }

  test("version family: stem + suffix derivation and next-uid") {
    val rng = new java.util.Random(1)
    val uid = Versioning.createUid(rng)
    assert(uid.length === 20)
    assert(Versioning.suffix(uid) === "0000")
    val next = Versioning.nextUidInFamily(Seq(uid))
    assert(Versioning.stem(next) === Versioning.stem(uid))
    assert(Versioning.suffix(next) === "0001")
    // max is by decoded value, not string collation: "000Z" -> "000a"
    val z = Versioning.stem(uid) + "000Z"
    assert(Versioning.suffix(Versioning.nextUidInFamily(Seq(uid, z))) === "000a")
  }

  test("content hashing: file and dir digests") {
    val dir = java.nio.file.Files.createTempDirectory("hashspec")
    val f1 = dir.resolve("a.txt"); java.nio.file.Files.writeString(f1, "hello")
    val f2 = dir.resolve("b.txt"); java.nio.file.Files.writeString(f2, "world")
    val (h1, t1, n1, s1) = Hashing.stat(f1.toString)
    assert(t1 === "md5" && n1 === 1 && s1 === 5)
    assert(h1 === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    val (hd, td, nd, sd) = Hashing.stat(dir.toString)
    assert(td === "md5-d" && nd === 2 && sd === 10)
    // dir hash is order-independent: hash of sorted member hashes
    val expected = Hashing.md5String(
      Seq(h1, "7d793037a0760186574b0282f2f435e7").sorted.mkString)
    assert(hd === expected)
  }
}
