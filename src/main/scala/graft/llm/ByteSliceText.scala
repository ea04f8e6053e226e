package graft.llm

/** Shared tokenizer for the byte-slice text kernels
  * ([[Dedup.minhashSignatures]], [[TextAnalysis.fingerprints]]).
  *
  * Key identity: Spark's `split(text, " ")` (single-space regex, limit
  * -1) followed by `concat_ws(" ", window)` reproduces the ORIGINAL
  * byte sequence — empty tokens from consecutive spaces round-trip —
  * so every k-token shingle STRING is a contiguous UTF-8 slice of the
  * text. Kernels can therefore hash/digest raw byte ranges in place,
  * never materializing token or shingle strings.
  */
private[llm] object ByteSliceText {

  /** Scans `bytes` and fills `starts` with token START offsets (0 and
    * every position after a space), growing it if needed. Returns
    * (possibly replaced) starts array and the token count. Token w's
    * 3-gram window ends at `starts(w + 3) - 2` (the byte before the
    * separating space) or `bytes.length - 1` for the last window.
    */
  def tokenStarts(bytes: Array[Byte], starts0: Array[Int]): (Array[Int], Int) = {
    var starts = starts0
    val len = bytes.length
    var nToks = 1
    starts(0) = 0
    var p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) {
        if (nToks == starts.length) starts = java.util.Arrays.copyOf(starts, nToks * 2)
        starts(nToks) = p + 1
        nToks += 1
      }
      p += 1
    }
    (starts, nToks)
  }
}
