"""BloomMapFile container bridge — the last legacy K/V container family
without a byte-level read/write path (VERDICT r4 "What's missing" #3).

A BloomMapFile (HC/io/BloomMapFile.java:49) is a directory of three
files: ``data`` (a sorted SequenceFile of key/value records), ``index``
(a SequenceFile of every Nth key → byte position in ``data``,
HC/io/MapFile.java:310-324), and ``bloom`` (a serialized
DynamicBloomFilter over the Writable-serialized keys,
BloomMapFile.java:186-199). ``Reader.probablyHasKey`` tests the filter
before touching data — the membership-skip idiom our relational
``operators/bloom.py`` already implements; THIS module is the on-disk
format parity so real legacy directories migrate byte-for-byte.

Format parity transcribed from the reference's public sources (parity is
the feature — verified against the JVM's own classes in tests, not
copied from them):

- SequenceFile v6 uncompressed record framing
  (HC/io/SequenceFile.java:202,1145-1157 header;
  :1330-1348 records [recordLen i32][keyLen i32][key][value];
  :206-211,1227-1232 sync escape −1 + 16 bytes every ≥2000 bytes).
- Writable codecs: WritableUtils VInt (HC/io/WritableUtils.java:271
  writeVLong ladder), Text = VInt + UTF-8, LongWritable = i64 BE.
- MapFile index: first record always indexed (lastIndexKeyCount =
  Long.MIN_VALUE), then every ``indexInterval``-th, position = data EOF
  before the append (MapFile.java:310-324).
- DynamicBloomFilter wire form (util/bloom/Filter.java:197-201 header
  [VERSION=−1 i32][nbHash i32][hashType i8][vectorSize i32];
  DynamicBloomFilter.java:248-255 [nr i32][currentNbRecord i32]
  [rows i32] rows; BloomFilter.java:200-216 LSB-first packed bits).
- Hash chain (util/bloom/HashFunction.java:117-122): initval-chained
  MurmurHash2 (util/hash/MurmurHash.java:41, int32 wraparound),
  abs(h) % vectorSize per probe; BloomMapFile uses HASH_COUNT=5 and
  vectorSize = ceil(−k·n / ln(1 − err^(1/k))) (BloomMapFile.java:162-172).

Scale: the bloom + index files are tiny side data; point lookups touch
at most one ``indexInterval`` run of ``data``. Full scans lift through
``spark.sparkContext.sequenceFile`` (split-aware via the sync markers)
exactly like readers.read_sequence_file.
"""

from __future__ import annotations

import io
import math
import os
import struct
from bisect import bisect_right
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

TEXT = "org.apache.hadoop.io.Text"
LONG_WRITABLE = "org.apache.hadoop.io.LongWritable"
NULL_WRITABLE = "org.apache.hadoop.io.NullWritable"
HASH_COUNT = 5  # BloomMapFile.java:52
MURMUR_HASH = 1  # util/hash/Hash.java:36 (the conf default)
JENKINS_HASH = 0
SYNC_INTERVAL = 2000  # SequenceFile.java:211 (100 * SYNC_SIZE)

_I32 = 1 << 32


def murmur_hash(data: bytes, seed: int) -> int:
    """Hadoop MurmurHash2 (util/hash/MurmurHash.java:41) with Java int32
    wraparound, returned as a SIGNED int32."""
    m = 0x5BD1E995
    h = (seed ^ len(data)) & 0xFFFFFFFF
    n4 = len(data) >> 2
    for i in range(n4):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
    left = len(data) - (n4 << 2)
    if left:
        # tail bytes are SIGN-EXTENDED ints in Java ((int) data[i])
        if left >= 3:
            h ^= (struct.unpack("b", data[-3:-2])[0] << 16) & 0xFFFFFFFF
        if left >= 2:
            h ^= (struct.unpack("b", data[-2:-1])[0] << 8) & 0xFFFFFFFF
        if left >= 1:
            h ^= struct.unpack("b", data[-1:])[0] & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h - _I32 if h >= 1 << 31 else h


def _rot(v: int, n: int) -> int:
    return ((v << n) | (v >> (32 - n))) & 0xFFFFFFFF


def jenkins_hash(data: bytes, seed: int) -> int:
    """Hadoop JenkinsHash (util/hash/JenkinsHash.java — Bob Jenkins'
    lookup3 hashlittle) with int32 wraparound, returned SIGNED — the
    legacy ``hadoop.util.hash.type=jenkins`` configuration's hash."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + (seed & 0xFFFFFFFF)) & 0xFFFFFFFF
    off = 0
    while length > 12:
        a = (a + data[off] + (data[off + 1] << 8) + (data[off + 2] << 16)
             + (data[off + 3] << 24)) & 0xFFFFFFFF
        b = (b + data[off + 4] + (data[off + 5] << 8) + (data[off + 6] << 16)
             + (data[off + 7] << 24)) & 0xFFFFFFFF
        c = (c + data[off + 8] + (data[off + 9] << 8) + (data[off + 10] << 16)
             + (data[off + 11] << 24)) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 4); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 6); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 8); b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 4); b = (b + a) & 0xFFFFFFFF
        off += 12
        length -= 12
    if length == 0:
        return c - _I32 if c >= 1 << 31 else c
    tail = data[off : off + length]
    shifts = [0, 8, 16, 24]
    for i in range(min(length, 4)):
        a = (a + (tail[i] << shifts[i])) & 0xFFFFFFFF
    for i in range(4, min(length, 8)):
        b = (b + (tail[i] << shifts[i - 4])) & 0xFFFFFFFF
    for i in range(8, min(length, 12)):
        c = (c + (tail[i] << shifts[i - 8])) & 0xFFFFFFFF
    c ^= b; c = (c - _rot(b, 14)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot(c, 11)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot(a, 25)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot(b, 16)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot(c, 4)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot(a, 14)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot(b, 24)) & 0xFFFFFFFF
    return c - _I32 if c >= 1 << 31 else c


_HASHES = {MURMUR_HASH: murmur_hash, JENKINS_HASH: jenkins_hash}


def bloom_positions(key_bytes: bytes, nb_hash: int, vector_size: int,
                    hash_type: int = MURMUR_HASH) -> list[int]:
    """HashFunction.hash (util/bloom/HashFunction.java:108-123): chained
    initval, Math.abs(h % maxValue) per probe. abs(h) % vectorSize is
    exactly Java's abs(h % v) for every int32 including MIN_VALUE.
    Both hash types are supported: murmur (the conf default) and
    jenkins (legacy ``hadoop.util.hash.type=jenkins`` files, and the
    pre-VERSION bloom wire format which implies jenkins)."""
    hash_fn = _HASHES.get(hash_type)
    if hash_fn is None:
        raise NotImplementedError(f"unknown hashType {hash_type}")
    if not key_bytes:
        raise ValueError("key length must be > 0")
    out, initval = [], 0
    for _ in range(nb_hash):
        initval = hash_fn(key_bytes, initval)
        out.append(abs(initval) % vector_size)
    return out


class DynamicBloom:
    """DynamicBloomFilter (util/bloom/DynamicBloomFilter.java): an s×m
    bit matrix; each row is a standard BloomFilter capped at ``nr`` keys.
    Rows are Python big-ints (bit i == vector position i)."""

    def __init__(self, vector_size: int, nb_hash: int = HASH_COUNT,
                 hash_type: int = MURMUR_HASH, nr: int = 0):
        self.vector_size = vector_size
        self.nb_hash = nb_hash
        self.hash_type = hash_type
        self.nr = nr
        self.current_nb_record = 0
        self.rows: list[int] = [0]

    def add(self, key_bytes: bytes) -> None:
        if self.current_nb_record >= self.nr:  # no active row -> new row
            self.rows.append(0)
            self.current_nb_record = 0
        mask = 0
        for p in bloom_positions(key_bytes, self.nb_hash, self.vector_size,
                                 self.hash_type):
            mask |= 1 << p
        self.rows[-1] |= mask
        self.current_nb_record += 1

    def might_contain(self, key_bytes: bytes) -> bool:
        mask = 0
        for p in bloom_positions(key_bytes, self.nb_hash, self.vector_size,
                                 self.hash_type):
            mask |= 1 << p
        return any((row & mask) == mask for row in self.rows)

    # ---- wire form (big-endian DataOutput) --------------------------------

    def to_bytes(self) -> bytes:
        out = io.BytesIO()
        nbytes = (self.vector_size + 7) // 8

        def header() -> None:  # Filter.java:197-201
            out.write(struct.pack(">ii", -1, self.nb_hash))
            out.write(struct.pack(">b", self.hash_type))
            out.write(struct.pack(">i", self.vector_size))

        header()
        out.write(struct.pack(">iii", self.nr, self.current_nb_record,
                              len(self.rows)))
        for row in self.rows:
            header()
            # BloomFilter.java:200-216: LSB-first within each byte ==
            # little-endian bit order == int.to_bytes little
            out.write(row.to_bytes(nbytes, "little"))
        return out.getvalue()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DynamicBloom":
        inp = io.BytesIO(blob)

        def header() -> tuple[int, int, int]:  # Filter.java:205-217
            ver = struct.unpack(">i", inp.read(4))[0]
            if ver >= 0:  # pre-VERSION legacy: ver IS nbHash, jenkins
                return ver, JENKINS_HASH, struct.unpack(">i", inp.read(4))[0]
            if ver != -1:
                raise ValueError(f"unsupported bloom filter version {ver}")
            nb_hash = struct.unpack(">i", inp.read(4))[0]
            hash_type = struct.unpack(">b", inp.read(1))[0]
            vector_size = struct.unpack(">i", inp.read(4))[0]
            return nb_hash, hash_type, vector_size

        nb_hash, hash_type, vector_size = header()
        nr, cur, nrows = struct.unpack(">iii", inp.read(12))
        f = cls(vector_size, nb_hash, hash_type, nr)
        f.current_nb_record = cur
        f.rows = []
        nbytes = (vector_size + 7) // 8
        for _ in range(nrows):
            header()  # per-row Filter header repeats
            f.rows.append(int.from_bytes(inp.read(nbytes), "little"))
        if inp.read(1):
            raise ValueError("trailing bytes after bloom filter")
        return f


class CountingBloom:
    """CountingBloomFilter (util/bloom/CountingBloomFilter.java): 4-bit
    saturating counters, 16 per 64-bit word — supports delete() unlike
    the plain filter. Wire form = Filter header + big-endian longs
    (write/readFields, CountingBloomFilter.java:220-236); bucket i lives
    in word i>>4 at nibble shift (i & 15) * 4."""

    BUCKET_MAX = 15

    def __init__(self, vector_size: int, nb_hash: int = HASH_COUNT,
                 hash_type: int = MURMUR_HASH):
        self.vector_size = vector_size
        self.nb_hash = nb_hash
        self.hash_type = hash_type
        self.words = [0] * ((vector_size + 15) // 16)

    def _buckets(self, key_bytes: bytes):
        for p in bloom_positions(key_bytes, self.nb_hash, self.vector_size,
                                 self.hash_type):
            yield p >> 4, (p & 0x0F) << 2

    def add(self, key_bytes: bytes) -> None:
        for w, shift in self._buckets(key_bytes):
            v = (self.words[w] >> shift) & 0xF
            if v < self.BUCKET_MAX:  # saturate, never wrap
                self.words[w] = (self.words[w] & ~(0xF << shift)) | ((v + 1) << shift)

    def delete(self, key_bytes: bytes) -> None:
        """Decrement buckets; like the reference, a saturated (15)
        bucket is sticky — it can no longer be safely decremented."""
        for w, shift in self._buckets(key_bytes):
            v = (self.words[w] >> shift) & 0xF
            if 1 <= v < self.BUCKET_MAX:
                self.words[w] = (self.words[w] & ~(0xF << shift)) | ((v - 1) << shift)

    def might_contain(self, key_bytes: bytes) -> bool:
        return all(((self.words[w] >> s) & 0xF) != 0 for w, s in self._buckets(key_bytes))

    def approximate_count(self, key_bytes: bytes) -> int:
        """Minimum bucket value over the key's probes
        (CountingBloomFilter.approximateCount)."""
        vals = [(self.words[w] >> s) & 0xF for w, s in self._buckets(key_bytes)]
        return min(vals) if vals else 0

    def to_bytes(self) -> bytes:
        out = io.BytesIO()
        out.write(struct.pack(">ii", -1, self.nb_hash))
        out.write(struct.pack(">b", self.hash_type))
        out.write(struct.pack(">i", self.vector_size))
        for w in self.words:
            out.write(struct.pack(">q", w - _I64 if w >= 1 << 63 else w))
        return out.getvalue()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountingBloom":
        inp = io.BytesIO(blob)
        ver, nb_hash = struct.unpack(">ii", inp.read(8))
        if ver != -1:
            raise ValueError(f"unsupported filter version {ver}")
        hash_type = struct.unpack(">b", inp.read(1))[0]
        vector_size = struct.unpack(">i", inp.read(4))[0]
        f = cls(vector_size, nb_hash, hash_type)
        f.words = [
            struct.unpack(">q", inp.read(8))[0] & 0xFFFFFFFFFFFFFFFF
            for _ in range(len(f.words))
        ]
        if inp.read(1):
            raise ValueError("trailing bytes after counting bloom filter")
        return f


_I64 = 1 << 64


def bloom_vector_size(num_keys: int, error_rate: float = 0.005,
                      k: int = HASH_COUNT) -> int:
    """BloomMapFile.initBloomFilter's sizing (BloomMapFile.java:162-172).
    ``errorRate`` is a Java FLOAT there (conf.getFloat) — round through
    float32 so the computed size matches the JVM bit-for-bit."""
    err = struct.unpack("f", struct.pack("f", error_rate))[0]
    return int(math.ceil(-k * num_keys / math.log(1.0 - err ** (1.0 / k))))


# ---- Writable codecs -------------------------------------------------------

def write_writable_vint(out: io.BytesIO, n: int) -> None:
    """WritableUtils.writeVLong (HC/io/WritableUtils.java:271) — NOT the
    tfile VInt: [-112,127] one byte, else a length-tagged big-endian body
    with the sign folded into the tag."""
    if -112 <= n <= 127:
        out.write(struct.pack(">b", n))
        return
    length = -112
    if n < 0:
        n = ~n
        length = -120
    tmp = n
    while tmp:
        tmp >>= 8
        length -= 1
    out.write(struct.pack(">b", length))
    nb = -(length + 120) if length < -120 else -(length + 112)
    out.write(n.to_bytes(nb, "big"))


def read_writable_vint(inp: io.BytesIO) -> int:
    first = struct.unpack(">b", inp.read(1))[0]
    if first >= -112:
        return first
    neg = first < -120
    nb = -(first + 120) if neg else -(first + 112)
    n = int.from_bytes(inp.read(nb), "big")
    return ~n if neg else n


def text_ser(s: str) -> bytes:
    """org.apache.hadoop.io.Text wire form: VInt byte-length + UTF-8 —
    ALSO the bytes BloomMapFile feeds the bloom key (key.write(buf),
    BloomMapFile.java:180-183)."""
    out = io.BytesIO()
    b = s.encode("utf-8")
    write_writable_vint(out, len(b))
    out.write(b)
    return out.getvalue()


def text_deser(b: bytes) -> str:
    inp = io.BytesIO(b)
    n = read_writable_vint(inp)
    return inp.read(n).decode("utf-8")


# ---- minimal SequenceFile v6 (uncompressed) -------------------------------

_SEQ_MAGIC = b"SEQ\x06"


class _SeqWriter:
    def __init__(self, path: str, key_class: str, val_class: str):
        self._f = open(path, "wb")
        self._f.write(_SEQ_MAGIC)
        hdr = io.BytesIO()
        for name in (key_class, val_class):
            write_writable_vint(hdr, len(name.encode()))
            hdr.write(name.encode())
        hdr.write(b"\x00\x00")  # compressed=false, blockCompressed=false
        hdr.write(struct.pack(">i", 0))  # empty SequenceFile.Metadata
        self._f.write(hdr.getvalue())
        # sync marker: any 16 bytes recorded in the header (the JVM uses
        # an MD5 of uid@time); deterministic here
        import hashlib

        self.sync = hashlib.md5(
            b"hadoop_common_spark:" + os.path.basename(path).encode()
        ).digest()
        self._f.write(self.sync)
        self._last_sync = self._f.tell()

    def tell(self) -> int:
        return self._f.tell()

    def append(self, key: bytes, value: bytes) -> None:
        if self._f.tell() >= self._last_sync + SYNC_INTERVAL:
            self._f.write(struct.pack(">i", -1))
            self._f.write(self.sync)
            self._last_sync = self._f.tell()
        self._f.write(struct.pack(">ii", len(key) + len(value), len(key)))
        self._f.write(key)
        self._f.write(value)

    def close(self) -> None:
        self._f.close()


_ZLIB_CODECS = (
    "org.apache.hadoop.io.compress.DefaultCodec",
    "org.apache.hadoop.io.compress.GzipCodec",
)


class _SeqHeader:
    """Parsed SequenceFile v6 header (SequenceFile.java:1145-1157)."""

    def __init__(self, blob: bytes):
        if blob[:4] != _SEQ_MAGIC:
            if blob[:3] == b"SEQ":
                raise ValueError(f"unsupported SequenceFile version {blob[3]}")
            raise ValueError("not a SequenceFile (bad magic)")
        inp = io.BytesIO(blob[4:])
        names = []
        for _ in range(2):
            n = read_writable_vint(inp)
            names.append(inp.read(n).decode())
        self.key_class, self.val_class = names
        self.compressed, self.block_compressed = inp.read(1)[0], inp.read(1)[0]
        self.codec = None
        if self.compressed or self.block_compressed:
            self.codec = inp.read(read_writable_vint(inp)).decode()
            if self.codec not in _ZLIB_CODECS:
                raise NotImplementedError(
                    f"SequenceFile codec {self.codec}: use spark."
                    f"sparkContext.sequenceFile (JVM codecs) — this "
                    f"pure-Python parser handles none/Default/Gzip only"
                )
        n_meta = struct.unpack(">i", inp.read(4))[0]
        for _ in range(2 * n_meta):  # Text key/value pairs
            inp.read(read_writable_vint(inp))
        self.sync = inp.read(16)
        self.body_start = 4 + inp.tell()  # absolute offset of first record


def read_seqfile_raw(path: str) -> tuple[str, str, list[tuple[bytes, bytes]]]:
    """Parse one SequenceFile → (keyClass, valClass, raw Writable record
    bytes). Handles uncompressed record framing AND block compression
    with the zlib-family codecs (DefaultCodec/GzipCodec) — JVM MapFile
    writers ALWAYS block-compress the ``index`` file
    (MapFile.java:275-280 prepends compression(BLOCK), and
    Options.getOption takes the first match). Other codec/layout combos
    are rejected loudly (the JVM side, sc.sequenceFile, handles those)."""
    import zlib

    with open(path, "rb") as f:
        blob = f.read()
    hdr = _SeqHeader(blob)
    names = [hdr.key_class, hdr.val_class]
    compressed, block_compressed, sync = (
        hdr.compressed, hdr.block_compressed, hdr.sync,
    )
    inp = io.BytesIO(blob[4:])
    inp.seek(hdr.body_start - 4)
    records: list[tuple[bytes, bytes]] = []
    size = len(blob) - 4

    def unz(b: bytes) -> bytes:
        return zlib.decompress(b, 47)  # auto-detect zlib/gzip wrapping

    if block_compressed:
        # per block (SequenceFile.java BlockCompressWriter.sync): sync
        # escape, VInt recordCount, then 4 length-prefixed compressed
        # buffers: keyLengths, keys, valueLengths, values
        while inp.tell() < size:
            esc = struct.unpack(">i", inp.read(4))[0]
            if esc != -1 or inp.read(16) != sync:
                raise ValueError("block sync marker mismatch (corrupt file)")
            n_rec = read_writable_vint(inp)
            bufs = []
            for _ in range(4):
                blen = read_writable_vint(inp)
                bufs.append(unz(inp.read(blen)))
            klens = io.BytesIO(bufs[0])
            keys = io.BytesIO(bufs[1])
            vlens = io.BytesIO(bufs[2])
            vals = io.BytesIO(bufs[3])
            for _ in range(n_rec):
                k = keys.read(read_writable_vint(klens))
                v = vals.read(read_writable_vint(vlens))
                records.append((k, v))
        return names[0], names[1], records

    while inp.tell() < size:
        rec_len = struct.unpack(">i", inp.read(4))[0]
        if rec_len == -1:  # sync escape
            if inp.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt file)")
            continue
        key_len = struct.unpack(">i", inp.read(4))[0]
        key = inp.read(key_len)
        value = inp.read(rec_len - key_len)
        if compressed:  # record compression: values only
            value = unz(value)
        records.append((key, value))
    return names[0], names[1], records


# ---- BloomMapFile writer / reader -----------------------------------------

def write_bloom_map_file(
    dir_path: str,
    records: Iterable[tuple[str, str]],
    index_interval: int = 128,
    num_keys: int = 1024 * 1024,
    error_rate: float = 0.005,
) -> int:
    """Write a Text→Text BloomMapFile directory (data + index + bloom)
    the JVM's BloomMapFile.Reader accepts. Keys must arrive sorted in
    Text order (UTF-8 byte order — exactly Python str's UTF-8 bytes
    compare); raises on violations like MapFile.Writer.checkKey."""
    os.makedirs(dir_path, exist_ok=True)
    data = _SeqWriter(os.path.join(dir_path, "data"), TEXT, TEXT)
    index = _SeqWriter(os.path.join(dir_path, "index"), TEXT, LONG_WRITABLE)
    bloom = DynamicBloom(bloom_vector_size(num_keys, error_rate),
                         HASH_COUNT, MURMUR_HASH, nr=num_keys)
    size = 0
    last_index_pos = -1
    last_index_count = None  # MapFile lastIndexKeyCount = Long.MIN_VALUE
    prev = None
    for k, v in records:
        kb = k.encode("utf-8")
        if prev is not None and kb < prev:
            raise ValueError(f"key out of order: {k!r} after {prev.decode()!r}")
        prev = kb
        kser = text_ser(k)
        pos = data.tell()
        if (last_index_count is None or size >= last_index_count + index_interval) \
                and pos > last_index_pos:
            index.append(kser, struct.pack(">q", pos))
            last_index_pos = pos
            last_index_count = size
        data.append(kser, text_ser(v))
        bloom.add(kser)
        size += 1
    data.close()
    index.close()
    with open(os.path.join(dir_path, "bloom"), "wb") as f:
        f.write(bloom.to_bytes())
    return size


class BloomMapReader:
    """Point-lookup reader: bloom test first (probablyHasKey), then
    index bisect + one bounded scan of ≤ indexInterval data records —
    never a full-file read on the hit path either (records are walked
    lazily from the seek position)."""

    def __init__(self, dir_path: str):
        self.dir = dir_path
        bloom_path = os.path.join(dir_path, "bloom")
        self.bloom = None
        if os.path.exists(bloom_path):  # absent -> plain MapFile fallback
            with open(bloom_path, "rb") as f:
                self.bloom = DynamicBloom.from_bytes(f.read())
        _, _, idx = read_seqfile_raw(os.path.join(dir_path, "index"))
        self.index_keys = [text_deser(k) for k, _ in idx]
        self.index_pos = [struct.unpack(">q", v)[0] for _, v in idx]
        with open(os.path.join(dir_path, "data"), "rb") as f:
            self._data = f.read()
        self._hdr = _SeqHeader(self._data)
        if self._hdr.compressed or self._hdr.block_compressed:
            raise NotImplementedError(
                "compressed BloomMapFile data: scan via read_bloom_map "
                "(JVM codecs); the Python point-lookup path handles "
                "uncompressed data files"
            )

    def probably_has_key(self, key: str) -> bool:
        if self.bloom is None:
            return True
        return self.bloom.might_contain(text_ser(key))

    def _scan_from(self, pos: int) -> Iterator[tuple[str, str, int]]:
        inp = io.BytesIO(self._data)
        inp.seek(pos)
        size = len(self._data)
        while inp.tell() < size:
            rec_len = struct.unpack(">i", inp.read(4))[0]
            if rec_len == -1:
                inp.read(16)
                continue
            key_len = struct.unpack(">i", inp.read(4))[0]
            k = text_deser(inp.read(key_len))
            vb = inp.read(rec_len - key_len)
            # zero-length value = NullWritable (SetFile members)
            v = text_deser(vb) if vb else ""
            yield k, v, inp.tell()

    def get(self, key: str) -> str | None:
        """Reader.get with the bloom fast path (BloomMapFile.java:259)."""
        if not self.probably_has_key(key):
            return None
        i = bisect_right(self.index_keys, key) - 1
        if i < 0:
            return None
        for k, v, _ in self._scan_from(self.index_pos[i]):
            if k == key:
                return v
            if k > key:
                return None
        return None

    def items(self) -> Iterator[tuple[str, str]]:
        for k, v, _ in self._scan_from(self._hdr.body_start):
            yield k, v


# ---- ArrayFile / SetFile (the remaining MapFile specializations) ----------
#
# ArrayFile (HC/io/ArrayFile.java): a MapFile whose key is an
# auto-incremented LongWritable — a persistent array with positional get.
# SetFile (HC/io/SetFile.java): a MapFile with NullWritable values — a
# persistent sorted set with membership seek. Both reuse the exact MapFile
# directory layout (data + block-compressed-or-not index), so the bridges
# below are the Writable-type specializations of the machinery above.


def write_array_file(
    dir_path: str, values: Iterable[str], index_interval: int = 128
) -> int:
    """Write an ArrayFile directory (LongWritable→Text) the JVM's
    ArrayFile.Reader accepts; returns the element count."""
    os.makedirs(dir_path, exist_ok=True)
    data = _SeqWriter(os.path.join(dir_path, "data"), LONG_WRITABLE, TEXT)
    index = _SeqWriter(os.path.join(dir_path, "index"), LONG_WRITABLE, LONG_WRITABLE)
    n = 0
    last_index_pos = -1
    last_index_count = None
    for v in values:
        kser = struct.pack(">q", n)
        pos = data.tell()
        if (last_index_count is None or n >= last_index_count + index_interval) \
                and pos > last_index_pos:
            index.append(kser, struct.pack(">q", pos))
            last_index_pos, last_index_count = pos, n
        data.append(kser, text_ser(v))
        n += 1
    data.close()
    index.close()
    return n


def read_array_file(path: str) -> list[str]:
    """Full ordered read of an ArrayFile directory; validates the
    0..n-1 LongWritable key sequence ArrayFile.Writer guarantees."""
    _, _, recs = read_seqfile_raw(os.path.join(path, "data"))
    out = []
    for i, (k, v) in enumerate(recs):
        if struct.unpack(">q", k)[0] != i:
            raise ValueError(f"ArrayFile key {struct.unpack('>q', k)[0]} != position {i}")
        out.append(text_deser(v))
    return out


def array_file_get(path: str, n: int) -> str | None:
    """Positional get: index bisect + one bounded scan from the nearest
    indexed position (the Reader.get(n) analog)."""
    _, _, idx = read_seqfile_raw(os.path.join(path, "index"))
    keys = [struct.unpack(">q", k)[0] for k, _ in idx]
    poss = [struct.unpack(">q", v)[0] for _, v in idx]
    i = bisect_right(keys, n) - 1
    if i < 0:
        return None
    with open(os.path.join(path, "data"), "rb") as f:
        blob = f.read()
    inp = io.BytesIO(blob)
    inp.seek(poss[i])
    while inp.tell() < len(blob):
        rec_len = struct.unpack(">i", inp.read(4))[0]
        if rec_len == -1:
            inp.read(16)
            continue
        key_len = struct.unpack(">i", inp.read(4))[0]
        k = struct.unpack(">q", inp.read(key_len))[0]
        vb = inp.read(rec_len - key_len)
        if k == n:
            return text_deser(vb)
        if k > n:
            return None
    return None


def write_set_file(
    dir_path: str, keys: Iterable[str], index_interval: int = 128
) -> int:
    """Write a SetFile directory (sorted Text keys, NullWritable values)
    the JVM's SetFile.Reader accepts; enforces strict key order like
    SetFile.Writer.append."""
    os.makedirs(dir_path, exist_ok=True)
    data = _SeqWriter(os.path.join(dir_path, "data"), TEXT, NULL_WRITABLE)
    index = _SeqWriter(os.path.join(dir_path, "index"), TEXT, LONG_WRITABLE)
    n = 0
    last_index_pos = -1
    last_index_count = None
    prev: bytes | None = None
    for k in keys:
        kb = k.encode("utf-8")
        if prev is not None and kb <= prev:
            raise ValueError(f"set key out of order: {k!r} after {prev.decode()!r}")
        prev = kb
        kser = text_ser(k)
        pos = data.tell()
        if (last_index_count is None or n >= last_index_count + index_interval) \
                and pos > last_index_pos:
            index.append(kser, struct.pack(">q", pos))
            last_index_pos, last_index_count = pos, n
        data.append(kser, b"")  # NullWritable serializes to zero bytes
        n += 1
    data.close()
    index.close()
    return n


def read_set_file(path: str) -> list[str]:
    """Ordered members of a SetFile directory."""
    _, _, recs = read_seqfile_raw(os.path.join(path, "data"))
    return [text_deser(k) for k, _ in recs]


def set_file_contains(path: str, key: str) -> bool:
    """Membership probe via the MapFile index machinery (no bloom file —
    a SetFile is a plain MapFile underneath)."""
    return BloomMapReader(path).get(key) is not None


def is_bloom_map_dir(path: str) -> bool:
    return os.path.isdir(path) and all(
        os.path.exists(os.path.join(path, n)) for n in ("data", "index")
    )


def read_bloom_map(
    spark: SparkSession, path: str, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Full-scan lift of a (Bloom)MapFile directory to a DataFrame: the
    ``data`` SequenceFile through the split-aware JVM reader, exactly
    like readers.read_sequence_file — index/bloom are lookup side files
    and don't participate in a scan."""
    rdd = spark.sparkContext.sequenceFile(os.path.join(path, "data"))
    return spark.createDataFrame(rdd, schema=[key_col, value_col])
