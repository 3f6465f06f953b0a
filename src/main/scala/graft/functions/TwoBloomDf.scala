package graft.functions

import org.apache.spark.util.sketch.BloomFilter

/** Constant-shuffle duplicate-key detection: a single aggregation pass whose
  * ONLY cross-task traffic is a pair of fixed-size Bloom filters per task,
  * regardless of corpus size — the shape that makes a df>=2 key prune
  * affordable at 100 TB, where an exact per-key count would shuffle every
  * distinct key (measured in BloomPruneSpec to cost as much as the stream
  * exchange it is supposed to save).
  *
  * Buffer: (`seen`, `dup`). `reduce` promotes a key already in `seen` to
  * `dup`, else inserts into `seen`. `merge` takes
  * `dup = dupA | dupB | (seenA & seenB)` and `seen = seenA | seenB`.
  * Bitwise AND of two identically-shaped Bloom filters over-approximates
  * the intersection of their key sets — every bit of a key inserted into
  * both is set in both — so errors go only toward false POSITIVES. A true
  * df>=2 key therefore always lands in `dup`: both occurrences in one task
  * → `reduce` promotes it; occurrences in different tasks → the AND keeps
  * it. False-positive admissions are harmless to the consumer (a pairless
  * key entering a pair join produces no pairs), and because the merge tree
  * shape varies run to run, the exact FP SET is not stable — consumers must
  * treat membership as "possibly duplicate", never as a declared result.
  *
  * The AND works on the spark-sketch serialized stream (int version, int
  * numHashFunctions, int numWords, long words[]): identically-parameterized
  * filters serialize to identical headers, so a byte-wise AND past the
  * 12-byte header is a long-wise AND of the bit arrays. `dup` serialized
  * here is byte-compatible with what `might_contain`
  * (BloomFilterMightContain) deserializes.
  */
object TwoBloomDf {

  /** Mutable per-task buffer; Java serialization (spark closure/result
    * transport) delegates to the sketch's own writeTo/readFrom.
    */
  final class Buf(@transient private var seen: BloomFilter,
      @transient private var dup: BloomFilter) extends Serializable {

    def reduce(x: Long): Buf = {
      if (seen.mightContainLong(x)) dup.putLong(x) else seen.putLong(x)
      this
    }

    def merge(other: Buf): Buf = {
      val inter = and(ser(seen), ser(other.seen))
      dup.mergeInPlace(other.dup)
      dup.mergeInPlace(deser(inter))
      seen.mergeInPlace(other.seen)
      this
    }

    def dupBytes: Array[Byte] = ser(dup)

    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val s = ser(seen); val d = ser(dup)
      out.writeInt(s.length); out.write(s)
      out.writeInt(d.length); out.write(d)
    }

    private def readObject(in: java.io.ObjectInputStream): Unit = {
      def arr(): Array[Byte] = {
        val a = new Array[Byte](in.readInt()); in.readFully(a); a
      }
      seen = deser(arr())
      dup = deser(arr())
    }
  }

  def zero(numBits: Long): Buf = {
    // expectedNumItems fixes numHashFunctions; pinning both keeps every
    // task's filter byte-identical in shape so `and` can work bit-wise
    val expected = math.max(numBits / 16, 64L)
    new Buf(BloomFilter.create(expected, numBits), BloomFilter.create(expected, numBits))
  }

  val reduce: (Buf, Long) => Buf = (b, x) => b.reduce(x)
  val merge: (Buf, Buf) => Buf = (a, b) => a.merge(b)

  private def ser(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  private def deser(a: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))

  private def and(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, s"bloom shape mismatch: ${a.length} vs ${b.length}")
    val out = a.clone()
    var i = 12
    while (i < out.length) { out(i) = (out(i) & b(i)).toByte; i += 1 }
    out
  }
}
