"""Sequential numpy oracle for the Cascaded format.

Independent re-implementation of the reference's semantics (reference
src/CascadedKernels.hiph) used to validate the dense JAX implementation:
byte layouts, alignment rules, layer ordering, and the incompressible
fallback all follow the reference C code, executed sequentially in numpy.
"""

from __future__ import annotations

import numpy as np


def _round_up(x: int, y: int) -> int:
    return (x + y - 1) // y * y


def _signed(dtype):
    return np.dtype(f"i{dtype.itemsize}") if dtype.kind == "u" else dtype


def for_bitwidth_oracle(x: np.ndarray):
    """(frame_of_reference unsigned, bitwidth) per the reference."""
    w = x.dtype.itemsize
    xs = x.view(_signed(x.dtype))
    minimum, maximum = int(xs.min()), int(xs.max())
    # wrapping subtract in 32-bit math for W <= 4, 64-bit for W == 8
    rng = (maximum - minimum) % (1 << (32 if w <= 4 else 64))
    bw = rng.bit_length()
    frame = np.array(minimum, _signed(x.dtype)).view(x.dtype)
    return frame, bw


def bitpack_oracle(x: np.ndarray) -> bytes:
    """Pack elements into the reference blob format (header + LE bitstream)."""
    w = x.dtype.itemsize
    n = x.size
    assert n < 65536
    if n == 0:
        frame, bw = np.zeros(1, x.dtype)[0], 0  # deterministic empty blob
    else:
        frame, bw = for_bitwidth_oracle(x)
    with np.errstate(over="ignore"):
        u = (x - frame).astype(x.dtype).view(np.dtype(f"u{w}"))  # wrapping subtract

    hdr_size = _round_up(w + 4, max(4, w))
    hdr = bytearray(hdr_size)
    hdr[0:w] = frame.tobytes()
    bw_off = _round_up(w, 4)
    hdr[bw_off : bw_off + 4] = np.uint32((bw << 16) | n).tobytes()

    # little-endian bitstream
    total_bits = n * bw
    num_words = (total_bits + 31) // 32
    acc = 0
    for i, v in enumerate(u):
        acc |= int(v) << (i * bw)
    data = acc.to_bytes(num_words * 4, "little") if num_words else b""
    return bytes(hdr) + data


def bitunpack_oracle(blob: bytes, dtype) -> np.ndarray:
    dtype = np.dtype(dtype)
    w = dtype.itemsize
    hdr_size = _round_up(w + 4, max(4, w))
    frame = np.frombuffer(blob[:w], dtype=dtype)[0]
    bw_off = _round_up(w, 4)
    bw_word = np.frombuffer(blob[bw_off : bw_off + 4], dtype=np.uint32)[0]
    n = int(bw_word & 0xFFFF)
    bw = int(bw_word >> 16)
    if bw == 0:
        return np.full(n, frame, dtype)
    acc = int.from_bytes(blob[hdr_size:], "little")
    mask = (1 << bw) - 1
    udtype = np.dtype(f"u{w}")
    out = np.empty(n, udtype)
    wrap = 1 << (8 * w)
    frame_u = int(np.asarray(frame, dtype).view(udtype))
    for i in range(n):
        out[i] = udtype.type((((acc >> (i * bw)) & mask) + frame_u) % wrap)
    return out.view(dtype)


def rle_encode_oracle(x: np.ndarray):
    vals, counts = [], []
    i = 0
    while i < x.size:
        j = i
        while j + 1 < x.size and x[j + 1] == x[j]:
            j += 1
        vals.append(x[j])
        counts.append(j - i + 1)
        i = j + 1
    return np.array(vals, x.dtype), np.array(counts, np.uint16)


def rle_decode_oracle(vals, counts):
    return np.repeat(vals, counts.astype(np.int64))


def delta_encode_oracle(x: np.ndarray):
    first = x[0] if x.size else x.dtype.type(0)
    return (x[1:] - x[:-1]).astype(x.dtype), first


def delta_decode_oracle(d: np.ndarray, first):
    out = np.empty(d.size + 1, d.dtype)
    out[0] = first
    np.cumsum(d, out=out[1:], dtype=d.dtype)
    out[1:] += first
    return out


def chunk_metadata_size(num_rles: int, num_deltas: int, width: int) -> int:
    """reference src/CascadedKernels.hiph:101-106"""
    return _round_up(4 + 4 * (num_rles + 1), width) + _round_up(width * num_deltas, 4)


def cascaded_compress_oracle(data: bytes, dtype, chunk_size=4096, num_rles=2, num_deltas=1, use_bp=True) -> bytes:
    """Compress one partition per the reference fused kernel.

    Follows do_cascaded_compression_kernel (reference
    src/CascadedKernels.hiph:766-1058) sequentially.
    """
    dtype = np.dtype(dtype)
    w = dtype.itemsize
    dtype_code = {("i", 1): 0, ("u", 1): 1, ("i", 2): 2, ("u", 2): 3, ("i", 4): 4, ("u", 4): 5, ("i", 8): 6, ("u", 8): 7}[
        (dtype.kind, dtype.itemsize)
    ]
    n_elems = len(data) // w
    x = np.frombuffer(data[: n_elems * w], dtype=dtype)
    input_bytes = n_elems * w
    chunk_elems = chunk_size // w

    out = bytearray()
    out += bytes([num_rles, num_deltas, int(use_bp), dtype_code])
    out += np.uint32(input_bytes).tobytes()
    limit = 8 + _round_up(input_bytes, 4)

    use_compression = not (num_rles == 0 and num_deltas == 0 and not use_bp)
    # first chunk starts at offset 8 aligned to dtype (8 is aligned for w<=8)
    cur = _round_up(len(out), w)
    out += bytes(cur - len(out))

    meta_size = chunk_metadata_size(num_rles, num_deltas, w)
    num_chunks = (n_elems + chunk_elems - 1) // chunk_elems

    body = bytearray()
    for ci in range(num_chunks):
        if not use_compression:
            break
        chunk = x[ci * chunk_elems : min((ci + 1) * chunk_elems, n_elems)]
        chunk_start = len(body)
        meta = bytearray(meta_size)
        pos = chunk_start + meta_size

        rle_rem, delta_rem = num_rles, num_deltas
        buf = chunk.copy()
        delta_firsts = []
        for _ in range(max(num_rles, num_deltas)):
            if rle_rem > 0:
                vals, counts = rle_encode_oracle(buf)
                blob = bitpack_oracle(counts) if use_bp else counts.tobytes()
                if cur + pos + _round_up(len(blob), 4) > limit:
                    use_compression = False
                    break
                body_extend_at(body, pos, blob)
                meta[4 * (num_rles - rle_rem + 1) : 4 * (num_rles - rle_rem + 2)] = np.uint32(len(blob)).tobytes()
                pos += _round_up(len(blob), 4)
                buf = vals
                rle_rem -= 1
            if delta_rem > 0:
                d, first = delta_encode_oracle(buf)
                delta_firsts.append(first)
                buf = d
                delta_rem -= 1
        if not use_compression:
            break

        # final array, aligned to dtype (pos is already 4B-aligned)
        pos = _round_up(pos, w)
        blob = bitpack_oracle(buf) if use_bp else buf.tobytes()
        if cur + pos + _round_up(len(blob), 4) > limit:
            use_compression = False
            break
        body_extend_at(body, pos, blob)
        meta[4 * (num_rles + 1) : 4 * (num_rles + 2)] = np.uint32(len(blob)).tobytes()
        pos += _round_up(len(blob), 4)
        pos = _round_up(pos, w)

        # delta header
        dh_off = _round_up(4 + 4 * (num_rles + 1), w)
        for k, f in enumerate(delta_firsts):
            meta[dh_off + k * w : dh_off + (k + 1) * w] = np.array([f], dtype).tobytes()
        meta[0:4] = np.uint32(pos - chunk_start).tobytes()
        body[chunk_start : chunk_start + meta_size] = meta
        if len(body) < pos:
            body += bytes(pos - len(body))

    if not use_compression:
        out = bytearray()
        out += bytes([0, 0, 0, dtype_code])
        out += np.uint32(input_bytes).tobytes()
        out += bytes(_round_up(8, w) - 8)
        out += x.tobytes()
        out += bytes(_round_up(len(out), 4) - len(out))
        return bytes(out)

    return bytes(out) + bytes(body)


def body_extend_at(body: bytearray, pos: int, blob: bytes):
    if len(body) < pos:
        body += bytes(pos - len(body))
    body[pos : pos + len(blob)] = blob
    # pad to word boundary with zeros handled by later extends


def cascaded_decompress_oracle(comp: bytes, expected_bytes: int | None = None) -> bytes:
    """Decompress one partition per the reference fused kernel."""
    num_rles, num_deltas, use_bp, dtype_code = comp[0], comp[1], comp[2], comp[3]
    dtype = np.dtype(["int8", "uint8", "int16", "uint16", "int32", "uint32", "int64", "uint64"][dtype_code])
    w = dtype.itemsize
    uncompressed_bytes = int(np.frombuffer(comp[4:8], np.uint32)[0])
    n_elems = uncompressed_bytes // w

    if num_rles == 0 and num_deltas == 0 and use_bp == 0:
        off = _round_up(8, w)
        return comp[off : off + n_elems * w]

    meta_size = chunk_metadata_size(num_rles, num_deltas, w)
    pos = _round_up(8, w)
    out = []
    got = 0
    while pos < len(comp) and got < n_elems:
        meta = comp[pos : pos + meta_size]
        chunk_total = int(np.frombuffer(meta[0:4], np.uint32)[0])
        rle_sizes = [int(np.frombuffer(meta[4 * (k + 1) : 4 * (k + 2)], np.uint32)[0]) for k in range(num_rles)]
        final_size = int(np.frombuffer(meta[4 * (num_rles + 1) : 4 * (num_rles + 2)], np.uint32)[0])
        dh_off = _round_up(4 + 4 * (num_rles + 1), w)
        delta_firsts = [
            np.frombuffer(meta[dh_off + k * w : dh_off + (k + 1) * w], dtype)[0] for k in range(num_deltas)
        ]

        # section offsets (reference src/CascadedKernels.hiph:1288-1302)
        rle_offsets = [0]
        for k in range(num_rles - 1):
            rle_offsets.append(_round_up(rle_offsets[-1] + rle_sizes[k], 4))
        if num_rles > 0:
            final_off = _round_up(rle_offsets[-1] + rle_sizes[-1], max(4, w))
        else:
            final_off = 0
        base = pos + meta_size

        blob = comp[base + final_off : base + final_off + final_size]
        if use_bp:
            buf = bitunpack_oracle(blob, dtype)
        else:
            buf = np.frombuffer(blob, dtype).copy()

        rle_rem, delta_rem = num_rles, num_deltas
        for _ in range(max(num_rles, num_deltas)):
            if delta_rem > 0 and delta_rem >= rle_rem:
                buf = delta_decode_oracle(buf, delta_firsts[delta_rem - 1])
                delta_rem -= 1
            if rle_rem > 0 and rle_rem >= delta_rem:
                cblob = comp[base + rle_offsets[rle_rem - 1] : base + rle_offsets[rle_rem - 1] + rle_sizes[rle_rem - 1]]
                if use_bp:
                    counts = bitunpack_oracle(cblob, np.uint16)
                else:
                    counts = np.frombuffer(cblob, np.uint16)
                # num_runs = current element count (reference :1370-1378);
                # short blobs read as zero counts (UB in the reference,
                # defined here as zeros to match the jnp implementation)
                if counts.size < buf.size:
                    counts = np.concatenate([counts, np.zeros(buf.size - counts.size, np.uint16)])
                counts = counts[: buf.size]
                buf = rle_decode_oracle(buf, counts)
                rle_rem -= 1
        out.append(buf)
        got += buf.size
        pos = _round_up(pos + chunk_total, w)

    return b"".join(o.tobytes() for o in out)
