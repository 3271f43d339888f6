package graft.sources

import graft.SparkSpec

class VersionedRootSpec extends SparkSpec {

  test("versioned layout: nextVersion counts unpublished dirs, pointer round-trips, unpointered paths resolve to themselves") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-vroot-").toString + "/root"
    // a fresh base starts at 1; resolve falls through to the path
    assert(VersionedRoot.nextVersion(spark, base) == 1)
    assert(VersionedRoot.resolve(spark, base) == base)
    assert(VersionedRoot.current(spark, base).isEmpty)
    // an UNPUBLISHED build still claims its number — an abandoned
    // build must never collide with the next one
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(VersionedRoot.versionDir(base, 1)))
    assert(VersionedRoot.nextVersion(spark, base) == 2)
    // publish v-1; readers follow the pointer
    VersionedRoot.publish(spark, base, 1)
    assert(VersionedRoot.current(spark, base).contains(s"$base/v-1"))
    assert(VersionedRoot.resolve(spark, base) == s"$base/v-1")
    // versions need not be dense: v-5 publishes over the gap, and
    // ROLLBACK (re-publishing an older number) is legal
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(VersionedRoot.versionDir(base, 5)))
    VersionedRoot.publish(spark, base, 5)
    assert(VersionedRoot.resolve(spark, base) == s"$base/v-5")
    assert(VersionedRoot.nextVersion(spark, base) == 6)
    VersionedRoot.publish(spark, base, 1)
    assert(VersionedRoot.resolve(spark, base) == s"$base/v-1")
    // prune never touches the published version; keep retains the
    // most recent others
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(VersionedRoot.versionDir(base, 3)))
    assert(VersionedRoot.prune(spark, base, keep = 1) == Seq(3))
    assert(new java.io.File(s"$base/v-1").exists() &&
      new java.io.File(s"$base/v-5").exists() &&
      !new java.io.File(s"$base/v-3").exists())
    // a corrupt pointer fails loudly, never silently serves the base
    // (the out-of-band overwrite also invalidates hadoop's checksum
    // sidecar — drop it so the read reaches the garbage content)
    val ptr = java.nio.file.Paths.get(base, "_current")
    java.nio.file.Files.writeString(ptr, "garbage")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(base, "._current.crc"))
    intercept[IllegalArgumentException](VersionedRoot.resolve(spark, base))
  }
}
