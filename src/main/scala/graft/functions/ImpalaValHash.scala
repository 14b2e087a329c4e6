package graft.functions

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-exact re-implementations of the reference's value-hashing stack
  * (`be/src/util/hash-util.h`, `be/src/exprs/anyval-util.h`) so the
  * sketch aggregates (`ndv`, `distinctpc`, `distinctpcsa`) reproduce the
  * reference's estimates on the reference's own conformance corpus.
  *
  * Values hash over their native little-endian slot bytes:
  * bool/tinyint 1 byte, smallint 2, int/float 4, bigint/double 8, string
  * raw bytes, DECIMAL 4/8/16 bytes by precision
  * (`ColumnType::GetDecimalByteSize`), TIMESTAMP the 12-byte
  * {int64 nanos-of-day, uint32 julian-day} TimestampValue layout
  * (`timestamp-value.h:246-249`).
  */
object ImpalaValHash {

  /** Raw CRC32-C accumulation exactly as the SSE4.2 `crc32` instruction
    * chain in `HashUtil::CrcHash` (no pre/post inversion), with the
    * final halves-swap. Processing bytes sequentially is identical to
    * the word-at-a-time hardware loop.
    */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  def crc32(bytes: Array[Byte], seed: Int): Int = {
    var c = seed
    var i = 0
    while (i < bytes.length) {
      c = crcTable((c ^ bytes(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    (c << 16) | (c >>> 16)
  }

  private final val MurmurPrime = 0xc6a4a7935bd1e995L
  private final val MurmurR = 47
  final val Fnv64Seed = 0xcbf29ce484222325L // 14695981039346656037

  /** `HashUtil::MurmurHash2_64` over little-endian bytes. */
  def murmur2_64(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var h = seed ^ (len.toLong * MurmurPrime)
    val nWords = len / 8
    var w = 0
    while (w < nWords) {
      var k = 0L
      var i = 0
      val base = w * 8
      while (i < 8) {
        k |= (bytes(base + i).toLong & 0xff) << (8 * i)
        i += 1
      }
      k *= MurmurPrime
      k ^= k >>> MurmurR
      k *= MurmurPrime
      h ^= k
      h *= MurmurPrime
      w += 1
    }
    val tail = nWords * 8
    val rem = len & 7
    if (rem > 0) {
      var i = rem - 1
      while (i >= 0) {
        h ^= (bytes(tail + i).toLong & 0xff) << (8 * i)
        i -= 1
      }
      h *= MurmurPrime
    }
    h ^= h >>> MurmurR
    h *= MurmurPrime
    h ^= h >>> MurmurR
    h
  }

  private def le(v: Long, width: Int): Array[Byte] = {
    val b = new Array[Byte](width)
    var i = 0
    while (i < width) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  def decimalByteSize(precision: Int): Int =
    if (precision <= 9) 4 else if (precision <= 18) 8 else 16

  private final val MicrosPerDay = 86400000000L
  private final val JulianEpochDay = 2440588L // JDN of 1970-01-01

  /** The value's native byte layout (little-endian, x86 slot bytes). */
  def toBytes(v: Any, dt: DataType): Array[Byte] = (v, dt) match {
    case (b: java.lang.Boolean, _) => le(if (b.booleanValue()) 1L else 0L, 1)
    case (b: java.lang.Byte, _) => le(b.longValue(), 1)
    case (s: java.lang.Short, _) => le(s.longValue(), 2)
    case (i: java.lang.Integer, DateType) =>
      // no DATE in the reference's dialect; hash like an int slot
      le(i.longValue(), 4)
    case (i: java.lang.Integer, _) => le(i.longValue(), 4)
    case (f: java.lang.Float, _) =>
      le(java.lang.Float.floatToIntBits(f.floatValue()).toLong, 4)
    case (d: java.lang.Double, _) =>
      le(java.lang.Double.doubleToLongBits(d.doubleValue()), 8)
    case (l: java.lang.Long, TimestampType | TimestampNTZType) =>
      // TimestampValue{time_=nanos-of-day int64, date_=julian-day uint32}
      val days = Math.floorDiv(l.longValue(), MicrosPerDay)
      val nanos = Math.floorMod(l.longValue(), MicrosPerDay) * 1000L
      val out = new Array[Byte](12)
      System.arraycopy(le(nanos, 8), 0, out, 0, 8)
      System.arraycopy(le(days + JulianEpochDay, 4), 0, out, 8, 4)
      out
    case (l: java.lang.Long, _) => le(l.longValue(), 8)
    case (d: Decimal, t: DecimalType) =>
      decimalByteSize(t.precision) match {
        case 16 =>
          val unscaled = d.toJavaBigDecimal.unscaledValue()
          val b = new Array[Byte](16)
          var i = 0
          while (i < 16) { b(i) = unscaled.shiftRight(8 * i).byteValue(); i += 1 }
          b
        case w => le(d.toUnscaledLong, w)
      }
    case (s: UTF8String, _) => s.getBytes
    case (b: Array[Byte], _) => b
    case (other, _) =>
      UTF8String.fromString(String.valueOf(other)).getBytes
  }

  /** `AnyValUtil::Hash` — seeded 32-bit CRC32-C of the slot bytes. */
  def hash32(v: Any, dt: DataType, seed: Int): Int = crc32(toBytes(v, dt), seed)

  /** `AnyValUtil::Hash64` — MurmurHash2_64 of the slot bytes. */
  def hash64(v: Any, dt: DataType, seed: Long): Long =
    murmur2_64(toBytes(v, dt), seed)
}

/** Precision-10 rows of the HLL++ empirical bias tables
  * (Heule/Nunkesser/Hall, "HyperLogLog in Practice", appendix dataset —
  * the same public data the reference embeds in
  * `be/src/exprs/hll-bias.h`), used by the `ndv` estimator's
  * low-cardinality correction.
  */
object HllBias {
  val RawEstimates: Array[Double] = Array(
    738.1256, 750.4234, 763.1064, 775.4732, 788.4636, 801.0644, 814.488,
    827.9654, 841.0832, 854.7864, 868.1992, 882.2176, 896.5228, 910.1716,
    924.7752, 938.899, 953.6126, 968.6492, 982.9474, 998.5214, 1013.1064,
    1028.6364, 1044.2468, 1059.4588, 1075.3832, 1091.0584, 1106.8606,
    1123.3868, 1139.5062, 1156.1862, 1172.463, 1189.339, 1206.1936,
    1223.1292, 1240.1854, 1257.2908, 1275.3324, 1292.8518, 1310.5204,
    1328.4854, 1345.9318, 1364.552, 1381.4658, 1400.4256, 1419.849,
    1438.152, 1456.8956, 1474.8792, 1494.118, 1513.62, 1532.5132,
    1551.9322, 1570.7726, 1590.6086, 1610.5332, 1630.5918, 1650.4294,
    1669.7662, 1690.4106, 1710.7338, 1730.9012, 1750.4486, 1770.1556,
    1791.6338, 1812.7312, 1833.6264, 1853.9526, 1874.8742, 1896.8326,
    1918.1966, 1939.5594, 1961.07, 1983.037, 2003.1804, 2026.071,
    2047.4884, 2070.0848, 2091.2944, 2114.333, 2135.9626, 2158.2902,
    2181.0814, 2202.0334, 2224.4832, 2246.39, 2269.7202, 2292.1714,
    2314.2358, 2338.9346, 2360.891, 2384.0264, 2408.3834, 2430.1544,
    2454.8684, 2476.9896, 2501.4368, 2522.8702, 2548.0408, 2570.6738,
    2593.5208, 2617.0158, 2640.2302, 2664.0962, 2687.4986, 2714.2588,
    2735.3914, 2759.6244, 2781.8378, 2808.0072, 2830.6516, 2856.2454,
    2877.2136, 2903.4546, 2926.785, 2951.2294, 2976.468, 3000.867,
    3023.6508, 3049.91, 3073.5984, 3098.162, 3121.5564, 3146.2328,
    3170.9484, 3195.5902, 3221.3346, 3242.7032, 3271.6112, 3296.5546,
    3317.7376, 3345.072, 3369.9518, 3394.326, 3418.1818, 3444.6926,
    3469.086, 3494.2754, 3517.8698, 3544.248, 3565.3768, 3588.7234,
    3616.979, 3643.7504, 3668.6812, 3695.72, 3719.7392, 3742.6224,
    3770.4456, 3795.6602, 3819.9058, 3844.002, 3869.517, 3895.6824,
    3920.8622, 3947.1364, 3973.985, 3995.4772, 4021.62, 4046.628, 4074.65,
    4096.2256, 4121.831, 4146.6406, 4173.276, 4195.0744, 4223.9696,
    4251.3708, 4272.9966, 4300.8046, 4326.302, 4353.1248, 4374.312,
    4403.0322, 4426.819, 4450.0598, 4478.5206, 4504.8116, 4528.8928,
    4553.9584, 4578.8712, 4603.8384, 4632.3872, 4655.5128, 4675.821,
    4704.6222, 4731.9862, 4755.4174, 4781.2628, 4804.332, 4832.3048,
    4862.8752, 4883.4148, 4906.9544, 4935.3516, 4954.3532, 4984.0248,
    5011.217, 5035.3258, 5057.3672, 5084.1828)

  val Biases: Array[Double] = Array(
    737.1256, 724.4234, 711.1064, 698.4732, 685.4636, 673.0644, 660.488,
    647.9654, 636.0832, 623.7864, 612.1992, 600.2176, 588.5228, 577.1716,
    565.7752, 554.899, 543.6126, 532.6492, 521.9474, 511.5214, 501.1064,
    490.6364, 480.2468, 470.4588, 460.3832, 451.0584, 440.8606, 431.3868,
    422.5062, 413.1862, 404.463, 395.339, 386.1936, 378.1292, 369.1854,
    361.2908, 353.3324, 344.8518, 337.5204, 329.4854, 321.9318, 314.552,
    306.4658, 299.4256, 292.849, 286.152, 278.8956, 271.8792, 265.118,
    258.62, 252.5132, 245.9322, 239.7726, 233.6086, 227.5332, 222.5918,
    216.4294, 210.7662, 205.4106, 199.7338, 194.9012, 188.4486, 183.1556,
    178.6338, 173.7312, 169.6264, 163.9526, 159.8742, 155.8326, 151.1966,
    147.5594, 143.07, 140.037, 134.1804, 131.071, 127.4884, 124.0848,
    120.2944, 117.333, 112.9626, 110.2902, 107.0814, 103.0334,
    99.4832000000001, 96.3899999999999, 93.7202000000002, 90.1714000000002,
    87.2357999999999, 85.9346, 82.8910000000001, 80.0264000000002,
    78.3834000000002, 75.1543999999999, 73.8683999999998, 70.9895999999999,
    69.4367999999999, 64.8701999999998, 65.0408000000002, 61.6738,
    59.5207999999998, 57.0158000000001, 54.2302, 53.0962, 50.4985999999999,
    52.2588000000001, 47.3914, 45.6244000000002, 42.8377999999998, 43.0072,
    40.6516000000001, 40.2453999999998, 35.2136, 36.4546, 33.7849999999999,
    33.2294000000002, 32.4679999999998, 30.8670000000002, 28.6507999999999,
    28.9099999999999, 27.5983999999999, 26.1619999999998, 24.5563999999999,
    23.2328000000002, 21.9484000000002, 21.5902000000001, 21.3346000000001,
    17.7031999999999, 20.6111999999998, 19.5545999999999, 15.7375999999999,
    17.0720000000001, 16.9517999999998, 15.326, 13.1817999999998,
    14.6925999999999, 13.0859999999998, 13.2754, 10.8697999999999, 11.248,
    7.3768, 4.72339999999986, 7.97899999999981, 8.7503999999999,
    7.68119999999999, 9.7199999999998, 7.73919999999998, 5.6224000000002,
    7.44560000000001, 6.6601999999998, 5.9058, 4.00199999999995,
    4.51699999999983, 4.68240000000014, 3.86220000000003, 5.13639999999987,
    5.98500000000013, 2.47719999999981, 2.61999999999989, 1.62800000000016,
    4.65000000000009, 0.225599999999758, 0.831000000000131,
    -0.359400000000278, 1.27599999999984, -2.92559999999958,
    -0.0303999999996449, 2.37079999999969, -2.0033999999996,
    0.804600000000391, 0.30199999999968, 1.1247999999996, -2.6880000000001,
    0.0321999999996478, -1.18099999999959, -3.9402, -1.47940000000017,
    -0.188400000000001, -2.10720000000038, -2.04159999999956,
    -3.12880000000041, -4.16160000000036, -0.612799999999879,
    -3.48719999999958, -8.17900000000009, -5.37780000000021,
    -4.01379999999972, -5.58259999999973, -5.73719999999958,
    -7.66799999999967, -5.69520000000011, -1.1247999999996,
    -5.58520000000044, -8.04560000000038, -4.64840000000004,
    -11.6468000000004, -7.97519999999986, -5.78300000000036,
    -7.67420000000038, -10.6328000000003, -9.81720000000041)

  /** k-nearest-neighbor bias interpolation (k=6), exactly the
    * reference's `HllEstimateBias`: squared distances into a sorted map
    * (first insert wins on ties), average the 6 nearest bias values,
    * truncate to long.
    */
  def estimateBias(estimate: Long): Long = {
    val k = 6
    // sorted (distance, index) with stable first-wins tie behavior
    val order = new java.util.TreeMap[Double, Int]()
    var i = 0
    while (i < RawEstimates.length) {
      val d = estimate - RawEstimates(i)
      order.putIfAbsent(d * d, i)
      i += 1
    }
    var bias = 0.0
    val it = order.values().iterator()
    var j = 0
    while (j < k && it.hasNext) { bias += Biases(it.next()); j += 1 }
    (bias / k).toLong
  }
}
