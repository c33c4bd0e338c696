"""Baseline JPEG codec — numpy + stdlib only, no imaging library.

Implements ITU-T T.81 DCT modes, 8-bit: the decoder
(:func:`decode_jpeg_pixels`) covers baseline sequential (SOF0) AND
full progressive (SOF2 — spectral selection and successive
approximation with EOB runs), huffman entropy decode, dequantization,
zigzag, 8×8 IDCT, restart markers, 2:1/4:2:0 chroma upsampling, and
the JFIF YCbCr→RGB transform; the encoder (:func:`encode_jpeg`, with
``progressive=True`` for SOF2) emits baseline 4:4:4 and progressive
JFIF using the Annex K example huffman tables. Both directions are
implemented from the published spec (same posture as the
PNG/RFC-2083 and GIF/LZW codecs in ``multimodal.py``) — the encoders
exist chiefly so the decoder can be round-trip verified in an
environment with no codec library, and so fixtures for the
driver-gated pixel-stat queries can be synthesized deterministically
(the gate row alternates baseline and progressive encodes, and
progressive==baseline decode is asserted bit-exact).

Out of scope (returns None / raises with a clear message rather than
producing wrong pixels): arithmetic coding, 12-bit precision,
hierarchical mode — decode parity target is the reference's media
plumbing (media blobs are opaque bytes to the reference engine;
SURVEY §2.7 multimodal north star), not a general codec library.

Scale note: this codec runs INSIDE Arrow-batched ``mapInPandas``
operators (multimodal.py) — per-row Python cost is the accepted price
of a dependency-free environment and is documented there; at deploy
time `decode_pixels` swaps to a native library behind the same
(h, w, channels)-uint8 contract.
"""

from __future__ import annotations

import struct

import numpy as np

# reject SOF dimension claims above this (pre-allocation bomb guard)
_MAX_PIXELS = 1 << 26

# zigzag scan order -> raster index in a flat 8x8 block (T.81 fig. 5)
_ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K example huffman tables (K.3.3): (bits[1..16], values).
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """M[u, x] = C(u)/2 · cos((2x+1)uπ/16): forward DCT is M·b·Mᵀ,
    inverse is Mᵀ·F·M (T.81 A.3.3, the exact float definition — no
    integer fast-DCT approximations, determinism beats speed here)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] = 0.5 / np.sqrt(2.0)
    return m


_M = _dct_basis()


from functools import lru_cache


@lru_cache(maxsize=64)
def _decode_lut(key):
    """16-bit-prefix huffman LUT for a canonical T.81 table spec
    ``key = (bits_tuple, vals_tuple)``: ``sym[peek16]`` is the decoded
    symbol, ``ln[peek16]`` its code length (0 = invalid code). One
    table lookup replaces up to 16 per-bit dict probes; the cache
    amortizes the 64 KiB build across every image sharing the table
    (in a corpus, nearly all of them — the Annex K tables dominate)."""
    bits, vals = key
    if sum(bits) != len(vals):
        # a DHT truncated mid-segment must raise the contract error,
        # not an IndexError from the table build
        raise ValueError("jpeg: malformed DHT (value list truncated)")
    sym = np.zeros(65536, dtype=np.uint8)
    ln = np.zeros(65536, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            prefix = code << (16 - length)
            span = 1 << (16 - length)
            sym[prefix : prefix + span] = vals[k]
            ln[prefix : prefix + span] = length
            k += 1
            code += 1
        code <<= 1
    return sym, ln


class _BitReader:
    """MSB-first bit reader over already de-stuffed entropy bytes —
    byte-fed int accumulator, so a multi-bit read is one shift+mask
    instead of a per-bit loop. Peeking past the stream end yields the
    spec's 1-pad bits (the final byte is 1-padded by encoders); only
    CONSUMING past the end raises, so truncation still surfaces as an
    error, never as garbage pixels."""

    __slots__ = ("data", "pos", "acc", "nbits", "consumed", "total")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.consumed = 0
        self.total = len(data) * 8

    def _fill(self, n: int) -> None:
        while self.nbits < n:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF  # 1-pad past the end
            self.nbits += 8

    def peek(self, n: int) -> int:
        self._fill(n)
        return (self.acc >> (self.nbits - n)) & ((1 << n) - 1)

    def consume(self, n: int) -> None:
        self.consumed += n
        if self.consumed > self.total:
            raise ValueError("jpeg: entropy stream truncated")
        self._fill(n)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek(n)
        self.consume(n)
        return v

    def receive_extend(self, s: int) -> int:
        """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed
        value."""
        if s == 0:
            return 0
        v = self.read_bits(s)
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    def decode_symbol(self, lut) -> int:
        sym, ln = lut
        p = self.peek(16)
        length = ln[p]
        if length == 0:
            raise ValueError("jpeg: invalid huffman code")
        self.consume(int(length))
        return int(sym[p])


def _split_scan(data: bytes):
    """Split the entropy-coded scan at RSTn markers, removing 0xFF00
    byte stuffing; returns (segments, bytes_consumed). Consumption
    stops at the first non-RST marker (EOI / next segment)."""
    segments = []
    cur = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any other marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg_pixels(content: bytes):
    """Decode a baseline-sequential OR progressive (SOF2) JPEG to an
    (h, w, channels) uint8 array (channels 3 for YCbCr color, 1 for
    grayscale), or None if the payload is not a JPEG (no SOI magic).
    Raises ValueError for features outside those modes (arithmetic
    coding, 12-bit, hierarchical) and for damaged/truncated files — an
    explicit contract beats silently wrong pixels.

    Covers: interleaved single-scan baseline; full progressive —
    spectral selection, successive approximation (DC and AC first +
    refinement scans, G.2), EOB runs — accumulating coefficients
    across scans and reconstructing once at EOI; standard and custom
    huffman/quant tables; restart intervals; subsampling factors 1-2
    with box (pixel-replication) chroma upsampling; JFIF YCbCr→RGB.
    """
    if len(content) < 3 or content[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    progressive = False
    coef = None  # progressive: cid -> (bh, bw, 64) int32, raster-indexed
    i = 2
    n = len(content)
    out_planes = None
    while i + 4 <= n:
        if content[i] != 0xFF:
            i += 1  # stray padding between segments
            continue
        marker = content[i + 1]
        if marker == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF FILL bytes may precede a
            # marker — FF FF <marker> means fill + marker, NOT a marker
            # 0xFF (misreading it desyncs the whole segment walk)
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", content[i + 2 : i + 4])
        body = content[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                width = 64 if pq == 0 else 128
                if j + width > len(body):
                    raise ValueError("jpeg: truncated DQT segment")
                if pq == 0:
                    vals = np.frombuffer(
                        body[j : j + 64], dtype=np.uint8
                    ).astype(np.int32)
                    j += 64
                else:
                    vals = (
                        np.frombuffer(body[j : j + 128], dtype=">u2")
                        .astype(np.int32)
                    )
                    j += 128
                table = np.zeros(64, dtype=np.int32)
                table[_ZIGZAG] = vals  # stored zigzag -> raster
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = tuple(body[j + 1 : j + 17])
                cnt = sum(bits)
                vals = tuple(body[j + 17 : j + 17 + cnt])
                j += 17 + cnt
                tbl = _decode_lut((bits, vals))
                (dc_tables if tc == 0 else ac_tables)[th] = tbl
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("jpeg: truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            if len(body) < 6:
                raise ValueError("jpeg: truncated SOF segment")
            precision = body[0]
            if precision != 8:
                raise ValueError(f"jpeg: {precision}-bit precision unsupported")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", body[1:5])
            if h * w > _MAX_PIXELS:
                # a corrupt/hostile SOF can claim 65535×65535 and
                # drive multi-GiB allocations (coefficient store /
                # spatial planes) before any entropy data is read —
                # the same pre-allocation guard class the PNG decoder
                # carries. 2^26 px ≈ 8K×8K, far above any fixture and
                # big enough for real photographic content.
                raise ValueError(
                    "jpeg: claimed dimensions exceed the decoder limit"
                )
            nc = body[5]
            if len(body) < 6 + 3 * nc:
                raise ValueError("jpeg: truncated SOF component list")
            comps = []
            for c in range(nc):
                cid, hv, tq_id = body[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(
                        f"jpeg: invalid sampling factors {hs}x{vs}"
                    )
                comps.append((cid, hs, vs, tq_id))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg: only baseline sequential and progressive DCT are "
                f"supported (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("jpeg: truncated SOS header")
            ns = body[0]
            if not 1 <= ns <= 4:
                raise ValueError(f"jpeg: invalid scan component count {ns}")
            scan_comps = []
            for c in range(ns):
                cs, tda = body[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tda >> 4, tda & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            data_start = i + 2 + seg_len
            segments, consumed = _split_scan(content[data_start:])
            if progressive:
                if coef is None:
                    coef = _alloc_coef(frame)
                _decode_progressive_scan(
                    frame, coef, scan_comps, dc_tables, ac_tables,
                    ss, se, ahal >> 4, ahal & 0x0F,
                    restart_interval, segments,
                )
            else:
                if ns != len(frame[2]):
                    raise ValueError(
                        "jpeg: non-interleaved multi-scan unsupported"
                    )
                scan_tables = {cs: (td, ta) for cs, td, ta in scan_comps}
                out_planes = _decode_scan(
                    frame, scan_tables, qt, dc_tables, ac_tables,
                    restart_interval, segments,
                )
            i = data_start + consumed
            continue
        i += 2 + seg_len
    if progressive and coef is not None:
        out_planes = _reconstruct_progressive(frame, coef, qt)
    if out_planes is None or frame is None:
        # the SOI magic matched but no complete scan was decoded — a
        # damaged/truncated JPEG, not a non-JPEG: raise, mirroring the
        # mid-entropy truncation contract (None is reserved for
        # payloads that are not JPEG at all)
        raise ValueError("jpeg: no decodable scan (truncated file?)")
    return _to_pixels(frame, out_planes)


def _decode_scan(frame, scan_tables, qt, dc_tables, ac_tables,
                 restart_interval, segments):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
    pred = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    reader = _BitReader(segments[0])
    n_mcus = mcux * mcuy
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1  # RSTn: re-align and reset DC predictors
            if seg_idx >= len(segments):
                raise ValueError("jpeg: missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcux)
        for cid, hs, vs, tq_id in comps:
            # every lookup can dangle in a corrupt file — each must be
            # the contract ValueError, not a KeyError (fuzzer finds)
            if cid not in scan_tables:
                raise ValueError(f"jpeg: scan lacks component {cid}")
            dct, act = scan_tables[cid]
            if dct not in dc_tables or act not in ac_tables:
                raise ValueError("jpeg: scan references undefined huffman table")
            dc_tbl, ac_tbl = dc_tables[dct], ac_tables[act]
            if tq_id not in qt:
                raise ValueError("jpeg: frame references undefined quant table")
            q = qt[tq_id]
            for by in range(vs):
                for bx in range(hs):
                    coeff = np.zeros(64, dtype=np.float64)
                    s = reader.decode_symbol(dc_tbl)
                    if s > 15:
                        raise ValueError("jpeg: DC category out of range")
                    pred[cid] += reader.receive_extend(s)
                    coeff[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tbl)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index out of range")
                        coeff[_ZIGZAG[k]] = reader.receive_extend(s)
                        k += 1
                    block = coeff.reshape(8, 8) * q
                    spatial = _M.T @ block @ _M + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
    return planes


def _geometry(frame):
    """MCU and per-component block-grid geometry: (hmax, vmax, mcux,
    mcuy, {cid: (bw_full, bh_full, bw_comp, bh_comp, hs, vs, tq)}).
    ``*_full`` spans the MCU grid (interleaved scans), ``*_comp`` the
    component's own ceil(size/8) grid (non-interleaved scans)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geo = {}
    for cid, hs, vs, tq in comps:
        cw = -(-(w * hs) // hmax)  # component samples
        ch = -(-(h * vs) // vmax)
        geo[cid] = (
            mcux * hs, mcuy * vs, -(-cw // 8), -(-ch // 8), hs, vs, tq
        )
    return hmax, vmax, mcux, mcuy, geo


def _alloc_coef(frame):
    """Per-component DCT-coefficient store for progressive decoding:
    raster-indexed (bh_full, bw_full, 64) int32 — scans accumulate
    into it; reconstruction happens once at EOI."""
    _, _, _, _, geo = _geometry(frame)
    return {
        cid: np.zeros((bh, bw, 64), dtype=np.int32)
        for cid, (bw, bh, *_rest) in geo.items()
    }


def _decode_progressive_scan(
    frame, coef, scan_comps, dc_tables, ac_tables,
    ss, se, ah, al, restart_interval, segments,
):
    """One progressive scan (T.81 G.2): DC scans (ss == 0, interleaved
    or single-component) and AC scans (single-component by spec),
    first pass (ah == 0) or successive-approximation refinement.
    Restart markers re-align the bitstream and reset DC predictors AND
    the EOB run."""
    h, w, comps = frame
    hmax, vmax, mcux, mcuy, geo = _geometry(frame)
    for cs, _td, _ta in scan_comps:
        if cs not in coef:
            raise ValueError(f"jpeg: scan lacks component {cs}")
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive DC scan with Se != 0")
        _decode_dc_scan(
            coef, scan_comps, dc_tables, ah, al,
            restart_interval, segments, mcux, mcuy, geo,
        )
    else:
        if len(scan_comps) != 1:
            raise ValueError("jpeg: progressive AC scan must be 1 component")
        if not 1 <= ss <= se <= 63:
            raise ValueError("jpeg: bad progressive spectral band")
        cs, _td, ta = scan_comps[0]
        if ta not in ac_tables:
            raise ValueError("jpeg: scan references undefined huffman table")
        _decode_ac_scan(
            coef[cs], ac_tables[ta], ss, se, ah, al,
            restart_interval, segments, geo[cs],
        )


def _decode_dc_scan(coef, scan_comps, dc_tables, ah, al,
                    restart_interval, segments, mcux, mcuy, geo):
    interleaved = len(scan_comps) > 1
    for cs, td, _ta in scan_comps:
        if ah == 0 and td not in dc_tables:
            raise ValueError("jpeg: scan references undefined huffman table")
    pred = {cs: 0 for cs, *_ in scan_comps}
    seg_idx = 0
    reader = _BitReader(segments[0])
    if interleaved:
        units = mcux * mcuy
    else:
        (cs0, *_r) = scan_comps[0]
        bw, bh = geo[cs0][2], geo[cs0][3]  # component grid
        units = bw * bh
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("jpeg: missing restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {cs: 0 for cs, *_ in scan_comps}
        if interleaved:
            my, mx = divmod(u, mcux)
            for cs, td, _ta in scan_comps:
                _bwf, _bhf, _bwc, _bhc, hs, vs, _tq = geo[cs]
                for by in range(vs):
                    for bx in range(hs):
                        _dc_unit(
                            reader, coef[cs], my * vs + by, mx * hs + bx,
                            dc_tables.get(td), pred, cs, ah, al,
                        )
        else:
            cs, td, _ta = scan_comps[0]
            bw = geo[cs][2]
            by, bx = divmod(u, bw)
            _dc_unit(reader, coef[cs], by, bx, dc_tables.get(td),
                     pred, cs, ah, al)


def _dc_unit(reader, carr, by, bx, dc_tbl, pred, cs, ah, al):
    if ah == 0:  # first scan: huffman diff, point-transformed
        s = reader.decode_symbol(dc_tbl)
        if s > 15:
            raise ValueError("jpeg: DC category out of range")
        pred[cs] += reader.receive_extend(s)
        if abs(pred[cs]) << al > 1 << 30:
            # legal DC magnitude is < 2^14; a corrupt stream can walk
            # the predictor arbitrarily far and overflow the int32
            # store — fail with the contract error instead
            raise ValueError("jpeg: DC coefficient out of range")
        carr[by, bx, 0] = pred[cs] << al
    else:  # refinement: one raw bit per block
        if reader.read_bits(1):
            carr[by, bx, 0] |= 1 << al


def _decode_ac_scan(carr, ac_tbl, ss, se, ah, al,
                    restart_interval, segments, comp_geo):
    bw, bh = comp_geo[2], comp_geo[3]
    seg_idx = 0
    reader = _BitReader(segments[0])
    eobrun = 0
    for u in range(bw * bh):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("jpeg: missing restart segment")
            reader = _BitReader(segments[seg_idx])
            eobrun = 0
        by, bx = divmod(u, bw)
        block = carr[by, bx]
        if ah == 0:
            eobrun = _ac_first_block(reader, block, ac_tbl, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_block(
                reader, block, ac_tbl, ss, se, al, eobrun
            )


def _ac_first_block(reader, block, ac_tbl, ss, se, al, eobrun):
    """AC first pass over one block's band (T.81 G.2.2): run-length +
    point-transformed values; EOBn codes start a run of all-zero-band
    blocks. Returns the eobrun remaining AFTER this block."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            extra = reader.read_bits(r) if r else 0
            return (1 << r) - 1 + extra  # EOBn: current block done
        k += r
        if k > se:
            raise ValueError("jpeg: AC index out of band")
        block[_ZIGZAG[k]] = reader.receive_extend(s) << al
        k += 1
    return 0


def _ac_refine_block(reader, block, ac_tbl, ss, se, al, eobrun):
    """AC successive-approximation refinement (T.81 G.2 / the
    correction-bit traversal): already-significant coefficients read
    one bit each inline; (run, 1) symbols place new ±1<<al values at
    the run-th zero-history position."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    extra = reader.read_bits(r) if r else 0
                    eobrun = (1 << r) + extra  # includes THIS block
                    break
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("jpeg: refinement magnitude must be 1")
                newval = p1 if reader.read_bits(1) else m1
            while k <= se:
                z = _ZIGZAG[k]
                if block[z] != 0:  # already significant → correction bit
                    if reader.read_bits(1) and (block[z] & p1) == 0:
                        block[z] += p1 if block[z] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                block[_ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        # EOB run: the rest of the band gets correction bits only
        while k <= se:
            z = _ZIGZAG[k]
            if block[z] != 0:
                if reader.read_bits(1) and (block[z] & p1) == 0:
                    block[z] += p1 if block[z] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(frame, coef, qt):
    """Dequantize + IDCT every accumulated block (vectorized einsum —
    one matmul pair over all blocks per component) into spatial
    planes, MCU-grid sized like the baseline path."""
    h, w, comps = frame
    planes = {}
    for cid, _hs, _vs, tq in comps:
        if tq not in qt:
            raise ValueError("jpeg: frame references undefined quant table")
        q = qt[tq].astype(np.float64)  # (8, 8) raster
        carr = coef[cid]
        bh, bw = carr.shape[0], carr.shape[1]
        blocks = carr.astype(np.float64).reshape(bh, bw, 8, 8) * q
        # per-block 2-D matmuls, the EXACT expression the baseline
        # path evaluates: batched einsum/matmul formulations change
        # float association by a last ulp, which flips rint at .5 and
        # breaks the progressive == baseline bit-equality contract
        plane = np.empty((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _M.T @ blocks[by, bx] @ _M + 128.0
                )
        planes[cid] = plane
    return planes


def _to_pixels(frame, planes):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return gray.reshape(h, w, 1)
    if len(full) != 3:
        raise ValueError(f"jpeg: {len(full)}-component images unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (baseline 4:4:4 JFIF, Annex K huffman tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    """Accumulator-based MSB-first bit writer with 0xFF byte stuffing
    — whole codes append in one shift, bytes drain in a tight loop."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def restart(self, n: int) -> None:
        """Flush and emit RSTn — marker bytes are never stuffed."""
        self.flush()
        self.out.append(0xFF)
        self.out.append(0xD0 + (n & 7))


def _encode_table(bits, vals):
    """symbol -> (length, code) for the encoder side."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit code) for a signed coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _flat_table(symbols):
    """A valid canonical huffman spec assigning every symbol the same
    code length L (smallest L with len < 2^L): zero compression, but a
    legal (incomplete) table — used by the progressive encoder, whose
    EOBn symbols the Annex K baseline tables do not contain. Also
    exercises the decoder's generic DHT handling."""
    length = (len(symbols)).bit_length()
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


_PROG_DC_SPEC = _flat_table(list(range(12)))
_PROG_AC_SPEC = _flat_table(
    [r << 4 for r in range(15)]                      # EOB0..EOB14
    + [0xF0]                                         # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


def _encode_progressive(comp_planes, sampling, h, w, nc, q, hmax, vmax):
    """Emit a progressive (SOF2) stream from level-shifted padded
    component planes: forward-DCT + quantize everything up front
    (vectorized), then the 4-phase scan script described in
    :func:`encode_jpeg`. Flat huffman tables (see :func:`_flat_table`)
    because the Annex K baseline tables lack the EOBn symbols."""
    al = 1  # one successive-approximation level

    # --- coefficients per component, zigzag order -----------------------
    coefz = []
    comp_grids = []  # (bw_full, bh_full, bw_comp, bh_comp)
    for ci, pp in enumerate(comp_planes):
        bh, bw = pp.shape[0] // 8, pp.shape[1] // 8
        # per-block 2-D matmuls — the EXACT float expression the
        # baseline encoder evaluates, so both modes quantize identical
        # coefficients (a batched einsum differed by a last ulp at
        # rint boundaries, silently breaking the progressive ==
        # baseline oracle)
        cz = np.empty((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                c2 = np.rint((_M @ block @ _M.T) / q).astype(np.int64)
                cz[by, bx] = c2.reshape(64)[_ZIGZAG]
        coefz.append(cz)
    # spec: non-interleaved scans cover ceil(comp_samples/8) blocks of
    # the TRUE image size, which can be one block smaller than the
    # MCU-padded grid (e.g. 2x2 sampling, w % 16 <= 8) — reuse the
    # decoder's geometry so both sides share one formula
    pseudo_frame = (
        h, w, [(ci + 1, *sampling[ci], 0) for ci in range(nc)]
    )
    _, _, _, _, geo = _geometry(pseudo_frame)
    for ci in range(nc):
        bwf, bhf, bw_c, bh_c, *_rest = geo[ci + 1]
        comp_grids.append((bwf, bhf, bw_c, bh_c))

    # --- headers --------------------------------------------------------
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    zz_q = q.reshape(64)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(
        int(x) for x in zz_q
    )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        hs, vs = sampling[c]
        out += bytes([c + 1, (hs << 4) | vs, 0])
    for tclass, (bits, vals) in ((0x00, _PROG_DC_SPEC), (0x10, _PROG_AC_SPEC)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tclass]) + bytes(bits) + bytes(vals)
    dc_enc = _encode_table(*_PROG_DC_SPEC)
    ac_enc = _encode_table(*_PROG_AC_SPEC)

    def sos(comp_ids, ss, se, ah, al_):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for c in comp_ids:
            hdr += bytes([c + 1, 0x00])
        return hdr + bytes([ss, se, (ah << 4) | al_])

    mcux = comp_planes[0].shape[1] // (8 * sampling[0][0])
    mcuy = comp_planes[0].shape[0] // (8 * sampling[0][1])

    # --- scan 1: DC first, interleaved, point transform al --------------
    out += sos(list(range(nc)), 0, 0, 0, al)
    wtr = _BitWriter()
    pred = [0] * nc
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            hs, vs = sampling[ci]
            for by in range(vs):
                for bx in range(hs):
                    dc = int(coefz[ci][my * vs + by, mx * hs + bx, 0]) >> al
                    s, code = _magnitude(dc - pred[ci])
                    pred[ci] = dc
                    ln, huff = dc_enc[s]
                    wtr.write(huff, ln)
                    if s:
                        wtr.write(code, s)
    wtr.flush()
    out += wtr.out

    # --- scans 2..: AC first per component, full band, al ---------------
    for ci in range(nc):
        out += sos([ci], 1, 63, 0, al)
        out += _encode_ac_first(coefz[ci], comp_grids[ci], ac_enc, 1, 63, al)

    # --- DC refinement, interleaved -------------------------------------
    out += sos(list(range(nc)), 0, 0, al, 0)
    wtr = _BitWriter()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            hs, vs = sampling[ci]
            for by in range(vs):
                for bx in range(hs):
                    wtr.write(
                        int(coefz[ci][my * vs + by, mx * hs + bx, 0]) & 1, 1
                    )
    wtr.flush()
    out += wtr.out

    # --- AC refinement per component (Ah = al, Al = al - 1 = 0) ---------
    for ci in range(nc):
        out += sos([ci], 1, 63, al, 0)
        out += _encode_ac_refine(coefz[ci], comp_grids[ci], ac_enc, 1, 63, 0)

    out += b"\xff\xd9"
    return bytes(out)


def _encode_ac_first(cz, grid, ac_enc, ss, se, al):
    """AC first scan (G.1.2.2): point-transformed magnitudes with run
    lengths; all-zero bands accumulate into EOB runs."""
    _bw, _bh, bw_c, bh_c = grid
    wtr = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ln, huff = ac_enc[r << 4]
            wtr.write(huff, ln)
            if r:
                wtr.write(eobrun - (1 << r), r)
            eobrun = 0

    for u in range(bw_c * bh_c):
        by, bx = divmod(u, bw_c)
        band = cz[by, bx]
        vals = [
            (1 if band[k] > 0 else -1) * (abs(int(band[k])) >> al)
            for k in range(ss, se + 1)
        ]
        nz = [j for j, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(nz[-1] + 1):
            v = vals[j]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                ln, huff = ac_enc[0xF0]
                wtr.write(huff, ln)
                run -= 16
            s, code = _magnitude(v)
            ln, huff = ac_enc[(run << 4) | s]
            wtr.write(huff, ln)
            wtr.write(code, s)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
    flush_eob()
    wtr.flush()
    return wtr.out


def _encode_ac_refine(cz, grid, ac_enc, ss, se, al):
    """AC refinement scan (G.1.2.3), emitted by SIMULATING the
    decoder's consumption: the decoder reads correction bits inline
    while traversing — a ZRL's bits are only those for significant
    coefficients inside ITS 16-zero-history window, and the next
    symbol's traversal picks up the rest. (An earlier revision
    buffered ALL bits after the first ZRL, desyncing the stream on any
    band with a ≥16-zero run followed by a significant coefficient —
    review-found, reproduced as silently wrong pixels.) Per position:
    'Z' = zero-history zero, 'S' = already significant (one correction
    bit), 'N' = newly significant (symbol + sign)."""
    _bw, _bh, bw_c, bh_c = grid
    ah = al + 1
    wtr = _BitWriter()
    eobrun = 0
    eob_bits: list[int] = []

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            ln, huff = ac_enc[r << 4]
            wtr.write(huff, ln)
            if r:
                wtr.write(eobrun - (1 << r), r)
            for b in eob_bits:
                wtr.write(b, 1)
            eob_bits.clear()
            eobrun = 0

    for u in range(bw_c * bh_c):
        by, bx = divmod(u, bw_c)
        band = [int(cz[by, bx][k]) for k in range(ss, se + 1)]
        # classify every band position the way the decoder sees it
        cls = []  # ('Z', None) | ('S', bit) | ('N', sign_bit)
        for c in band:
            a = abs(c)
            if (a >> ah) != 0:
                cls.append(("S", (a >> al) & 1))
            elif (a >> al) == 1:
                cls.append(("N", 1 if c > 0 else 0))
            else:
                cls.append(("Z", None))
        newly = [j for j, (t, _b) in enumerate(cls) if t == "N"]
        if not newly:
            eobrun += 1
            eob_bits.extend(b for t, b in cls if t == "S")
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        k = 0  # simulated decoder position within the band
        for p in newly:
            r = sum(1 for j in range(k, p) if cls[j][0] == "Z")
            while r > 15:
                # ZRL: decoder consumes exactly 16 zero-history
                # positions, reading S bits encountered BEFORE the
                # 16th zero — emit exactly those, in order
                ln, huff = ac_enc[0xF0]
                wtr.write(huff, ln)
                zcount = 0
                while zcount < 16:
                    t, b = cls[k]
                    if t == "S":
                        wtr.write(b, 1)
                    elif t == "Z":
                        zcount += 1
                    k += 1
                r -= 16
            ln, huff = ac_enc[(r << 4) | 1]
            wtr.write(huff, ln)
            wtr.write(cls[p][1], 1)  # sign
            # decoder traversal to the placement: S bits inline
            while k < p:
                if cls[k][0] == "S":
                    wtr.write(cls[k][1], 1)
                k += 1
            k = p + 1  # placement position consumed
        if k <= se - ss:
            # trailing band: EOB covers it; its S bits ride the EOBn
            eobrun += 1
            eob_bits.extend(
                cls[j][1] for j in range(k, se - ss + 1) if cls[j][0] == "S"
            )
    flush_eob()
    wtr.flush()
    return wtr.out


def _encode_block(writer, block, q, dc_tbl, ac_tbl, pred_dc: int) -> int:
    """Forward-DCT, quantize, and huffman-encode one 8×8 block; returns
    the new DC predictor."""
    coeff = np.rint((_M @ block @ _M.T) / q).astype(np.int64)
    zz = coeff.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred_dc
    s, code = _magnitude(diff)
    length, huff = dc_tbl[s]
    writer.write(huff, length)
    if s:
        writer.write(code, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, huff = ac_tbl[0xF0]  # ZRL
            writer.write(huff, length)
            run -= 16
        s, code = _magnitude(v)
        length, huff = ac_tbl[(run << 4) | s]
        writer.write(huff, length)
        writer.write(code, s)
        run = 0
    if last_nz < 63:
        length, huff = ac_tbl[0x00]  # EOB
        writer.write(huff, length)
    return int(zz[0])


def encode_jpeg(
    img,
    quant: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode a uint8 image — (h, w) / (h, w, 1) grayscale or
    (h, w, 3) RGB — as baseline sequential JFIF, or progressive (SOF2)
    when ``progressive=True``.

    ``quant`` is one 8×8 quantization table applied to every component
    (default: all ones — near-lossless, so decode(encode(x)) ≈ x within
    DCT rounding; the round-trip tests rely on this). ``subsampling``
    is ``"444"`` or ``"420"`` (2×2 box-averaged chroma);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (baseline only). Edge padding is pixel replication, the
    standard recommendation.

    The progressive scan script exercises every T.81 G path: DC first
    (point transform Al=1) → per-component AC first (full band, Al=1,
    EOB runs) → DC refinement → per-component AC refinement
    (correction bits). Since both modes quantize identical DCT
    coefficients, ``decode(progressive) == decode(baseline)``
    bit-for-bit — the internal oracle the tests assert."""
    if progressive and restart_interval:
        raise ValueError(
            "encode_jpeg: restart intervals are not emitted in "
            "progressive mode"
        )
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc == 1:
        planes = [img[:, :, 0].astype(np.float64)]
    elif nc == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError(f"encode_jpeg: {nc}-channel input unsupported")
    if subsampling not in ("444", "420"):
        raise ValueError(f"encode_jpeg: subsampling {subsampling!r} unsupported")
    sampling = (
        [(2, 2), (1, 1), (1, 1)]
        if subsampling == "420" and nc == 3
        else [(1, 1)] * nc
    )
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    q = (
        np.ones((8, 8), dtype=np.int32)
        if quant is None
        else np.asarray(quant, dtype=np.int32).reshape(8, 8)
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    # reading a raster-order table at _ZIGZAG yields the zigzag sequence
    zz_q = q.reshape(64)[_ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(int(x) for x in zz_q)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for c in range(nc):
        hs, vs = sampling[c]
        out += bytes([c + 1, (hs << 4) | vs, 0])
    # DHT segments
    specs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if nc == 3:
        specs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tclass, (bits, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tclass]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for c in range(nc):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += bytes([0, 63, 0])

    dc_enc = [_encode_table(*_DC_LUM)] + [_encode_table(*_DC_CHR)] * 2
    ac_enc = [_encode_table(*_AC_LUM)] + [_encode_table(*_AC_CHR)] * 2
    # pad every full-resolution plane to the MCU grid by replication,
    # then derive each component's (possibly downsampled) plane
    ph = -(-h // (8 * vmax)) * 8 * vmax
    pw = -(-w // (8 * hmax)) * 8 * hmax
    comp_planes = []
    for ci, p in enumerate(planes):
        pp = np.empty((ph, pw), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]  # replicate bottom edge
        pp[:, w:] = pp[:, w - 1 : w]  # then right edge
        hs, vs = sampling[ci]
        fy, fx = vmax // vs, hmax // hs
        if fy > 1 or fx > 1:  # box-average downsample
            pp = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            pp = np.rint(pp)
        comp_planes.append(pp - 128.0)
    if progressive:
        return _encode_progressive(
            comp_planes, sampling, h, w, nc, q, hmax, vmax
        )
    writer = _BitWriter()
    pred = [0] * nc
    mcux = pw // (8 * hmax)
    mcuy = ph // (8 * vmax)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.restart(rst)
            rst = (rst + 1) & 7
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            hs, vs = sampling[ci]
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    block = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                    pred[ci] = _encode_block(
                        writer, block, q, dc_enc[ci], ac_enc[ci], pred[ci]
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
