package graft

/** Single-threaded mirror of [[graft.functions.PortableHash.md5u32]] for spec
  * oracles — ONE copy, so a contract change (width, prefix) edits specs in one
  * place alongside the two engine spellings in PortableHash. */
object TestHash {
  def u32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
