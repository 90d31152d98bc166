#!/usr/bin/env python3
"""Deterministic AnnData-on-zarr fixture generator (no zarr/blosc deps).

Writes a zarr v2 directory store (JSON metadata + one file per chunk)
carrying the anndata element encodings in `.zattrs`, with chunks
compressed by a from-scratch blosc1 framer over a minimal-but-real LZ4
block compressor — the same wire format c-blosc emits for the
numcodecs default (cname=lz4, shuffle=1): 16-byte header, per-block
bstarts, typesize split streams when eligible, byte shuffle per block.
Every chunk written is immediately decoded back by the mirror decoder
in this file and asserted equal, so the fixture is self-verifying.

Closed forms (mirrored by the a12/a15 DuckDB oracles and ZarrSpec):
  n_obs=300, n_var=40
  obs: _index 'cell{i}', cell_type cat 'type_{i%4}', n_genes (i*7)%50,
       score ((i*3)%11)*0.25
  var: _index 'gene{j}', highly_variable (j%3==0)
  X (csr): mask (i*5 + j*11) % 23 == 0, value ((i*2 + j*13) % 19) * 0.5
  layers/log (dense): ((i*17 + j*3) % 29) * 0.25
  obsm/X_pca (300x5, zlib): ((i*13 + k*7) % 37) * 0.5
  uns: n_bins=42 (i8 scalar), method='zheng17' (str scalar),
       rank f8[8] chunks(5): k<5 -> (k*5 % 13)*0.5, chunk 1 ABSENT ->
       fill_value 9.0
"""
import json
import os
import shutil
import struct
import sys
import zlib

# ----------------------------------------------------------------- LZ4 block


def lz4_compress(src: bytes) -> bytes:
    """Greedy LZ4 block compressor (4-byte hash chains, 64k window).

    Honors the spec's end conditions: the last 5 bytes are literals and
    no match starts within the last 12 bytes.
    """
    n = len(src)
    out = bytearray()
    table = {}
    anchor = 0
    pos = 0
    limit = n - 12

    def emit(lit_end, match_len):
        lit_len = lit_end - anchor
        tok_lit = 15 if lit_len >= 15 else lit_len
        tok_match = 0 if match_len == 0 else (15 if match_len - 4 >= 15
                                              else match_len - 4)
        out.append((tok_lit << 4) | tok_match)
        if lit_len >= 15:
            v = lit_len - 15
            while v >= 255:
                out.append(255)
                v -= 255
            out.append(v)
        out.extend(src[anchor:lit_end])

    while pos < limit:
        key = src[pos:pos + 4]
        cand = table.get(key, -1)
        table[key] = pos
        if cand >= 0 and pos - cand <= 0xFFFF and src[cand:cand + 4] == key:
            mlen = 4
            while (pos + mlen < limit + 7 and  # keep last 5 bytes literal
                   src[cand + mlen] == src[pos + mlen]):
                mlen += 1
            emit(pos, mlen)
            out.extend(struct.pack('<H', pos - cand))
            if mlen - 4 >= 15:
                v = mlen - 4 - 15
                while v >= 255:
                    out.append(255)
                    v -= 255
                out.append(v)
            pos += mlen
            anchor = pos
        else:
            pos += 1
    emit(n, 0)  # trailing literals-only sequence
    anchor = n
    return bytes(out)


def lz4_decompress(src: bytes, dst_len: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src):
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while src[i] == 255:
                lit += 255
                i += 1
            lit += src[i]
            i += 1
        out.extend(src[i:i + lit])
        i += lit
        if i >= len(src):
            break
        off = struct.unpack_from('<H', src, i)[0]
        i += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while src[i] == 255:
                mlen += 255
                i += 1
            mlen += src[i]
            i += 1
        start = len(out) - off
        for k in range(mlen):  # byte loop: matches may overlap
            out.append(out[start + k])
    assert len(out) == dst_len, (len(out), dst_len)
    return bytes(out)


# -------------------------------------------------------------- blosc frame

MAX_SPLITS = 16
MIN_BUFFERSIZE = 128


def _shuffle(typesize: int, block: bytes) -> bytes:
    nel = len(block) // typesize
    tail = len(block) % typesize
    out = bytearray(len(block))
    for j in range(typesize):
        for i in range(nel):
            out[j * nel + i] = block[i * typesize + j]
    if tail:
        out[-tail:] = block[-tail:]
    return bytes(out)


def _unshuffle(typesize: int, block: bytes) -> bytes:
    nel = len(block) // typesize
    tail = len(block) % typesize
    out = bytearray(len(block))
    for j in range(typesize):
        for i in range(nel):
            out[i * typesize + j] = block[j * nel + i]
    if tail:
        out[-tail:] = block[-tail:]
    return bytes(out)


def blosc_encode(data: bytes, typesize: int, cname: str = 'lz4',
                 shuffle: bool = True, blocksize: int = 0,
                 force_memcpy: bool = False) -> bytes:
    """c-blosc1 chunk: header, bstarts, split streams (the real layout)."""
    nbytes = len(data)
    if typesize < 1 or typesize > 255:
        typesize = 1
    if blocksize <= 0:
        blocksize = max(typesize, min(nbytes, 8192))
    blocksize -= blocksize % typesize or 0
    comp_code = {'blosclz': 0, 'lz4': 1, 'zlib': 3}[cname]
    if force_memcpy:
        flags = 0x2 | (comp_code << 5) | (0x1 if shuffle else 0)
        # memcpyed chunks are NOT shuffled (blosc short-circuits them)
        header = struct.pack('<BBBBlll', 2, 1, 0x2 | (comp_code << 5),
                             typesize, nbytes, blocksize, nbytes + 16)
        return header + data
    do_shuffle = shuffle and typesize > 1
    split = (cname in ('lz4', 'blosclz') and typesize <= MAX_SPLITS
             and typesize > 1 and blocksize // typesize >= MIN_BUFFERSIZE)
    flags = (0x1 if do_shuffle else 0) | (comp_code << 5)
    if not split:
        flags |= 0x10  # dont_split (c-blosc >= 1.11 records the decision)
    nblocks = (nbytes + blocksize - 1) // blocksize
    blocks = []
    for b in range(nblocks):
        bsize = min(blocksize, nbytes - b * blocksize)
        raw = data[b * blocksize:b * blocksize + bsize]
        if do_shuffle:
            raw = _shuffle(typesize, raw)
        nsplits = typesize if (split and bsize == blocksize) else 1
        neblock = bsize // nsplits
        streams = bytearray()
        for s in range(nsplits):
            part = raw[s * neblock:(s + 1) * neblock]
            comp = (lz4_compress(part) if cname == 'lz4'
                    else zlib.compress(part, 5))
            if len(comp) >= len(part):
                comp = part  # stored: csize == neblock means raw
            streams += struct.pack('<l', len(comp)) + comp
        blocks.append(bytes(streams))
    head_len = 16 + 4 * nblocks
    bstarts = []
    off = head_len
    for blk in blocks:
        bstarts.append(off)
        off += len(blk)
    out = struct.pack('<BBBBlll', 2, 1, flags, typesize, nbytes, blocksize,
                      off)
    out += b''.join(struct.pack('<l', s) for s in bstarts)
    out += b''.join(blocks)
    return out


def blosc_decode(chunk: bytes) -> bytes:
    """Mirror decoder (self-check only; the Scala reader reimplements)."""
    _, _, flags, typesize, nbytes, blocksize, cbytes = struct.unpack_from(
        '<BBBBlll', chunk, 0)
    if flags & 0x2:
        return chunk[16:16 + nbytes]
    comp_code = (flags >> 5) & 0x7
    dont_split = bool(flags & 0x10)
    nblocks = (nbytes + blocksize - 1) // blocksize
    bstarts = struct.unpack_from('<%dl' % nblocks, chunk, 16)
    out = bytearray()
    for b in range(nblocks):
        bsize = min(blocksize, nbytes - b * blocksize)
        leftover = bsize != blocksize
        nsplits = 1 if (dont_split or leftover or typesize <= 1) else typesize
        neblock = bsize // nsplits
        pos = bstarts[b]
        block = bytearray()
        for s in range(nsplits):
            csize = struct.unpack_from('<l', chunk, pos)[0]
            pos += 4
            payload = chunk[pos:pos + csize]
            pos += csize
            if csize == neblock:
                block += payload
            elif comp_code == 1:
                block += lz4_decompress(payload, neblock)
            elif comp_code == 3:
                block += zlib.decompress(payload)
            else:
                raise AssertionError('compressor %d' % comp_code)
        if flags & 0x1 and typesize > 1:
            block = bytearray(_unshuffle(typesize, bytes(block)))
        out += block
    assert len(out) == nbytes
    return bytes(out)


# --------------------------------------------------------------- zarr store


def vlen_utf8(strings):
    out = struct.pack('<I', len(strings))
    for s in strings:
        b = s.encode('utf-8')
        out += struct.pack('<I', len(b)) + b
    return out


DT_PACK = {'<f8': ('<d', 8), '<f4': ('<f', 4), '<i8': ('<q', 8),
           '<i4': ('<i', 4), '<i2': ('<h', 2), '|i1': ('<b', 1),
           '|b1': ('<B', 1), '|u1': ('<B', 1)}


def write_json(root, rel, obj):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, 'w') as f:
        json.dump(obj, f, indent=1, sort_keys=True)


def write_group(root, rel, attrs):
    write_json(root, os.path.join(rel, '.zgroup'), {'zarr_format': 2})
    if attrs:
        write_json(root, os.path.join(rel, '.zattrs'), attrs)


def write_array(root, rel, shape, chunks, dtype, values, attrs,
                compressor='blosc-lz4', fill_value=0, skip_chunks=(),
                blocksize=0, force_memcpy=False):
    """values: flat C-order list (numbers, bools, or strings for |O)."""
    is_obj = dtype == '|O'
    zarray = {
        'zarr_format': 2, 'shape': list(shape), 'chunks': list(chunks),
        'dtype': dtype, 'order': 'C', 'fill_value': fill_value,
        'filters': [{'id': 'vlen-utf8'}] if is_obj else None,
        'dimension_separator': '.',
        'compressor': (
            None if compressor is None else
            {'id': 'zlib', 'level': 5} if compressor == 'zlib' else
            {'id': 'blosc', 'cname': compressor.split('-')[1], 'clevel': 5,
             'shuffle': 1, 'blocksize': blocksize}),
    }
    write_json(root, os.path.join(rel, '.zarray'), zarray)
    if attrs:
        write_json(root, os.path.join(rel, '.zattrs'), attrs)
    if not shape:  # 0-d scalar: single chunk keyed '0'
        grid = [()]
        cdims = ()
    else:
        cdims = tuple((shape[d] + chunks[d] - 1) // chunks[d]
                      for d in range(len(shape)))
        grid = [()]
        for d in range(len(shape)):
            grid = [g + (i,) for g in grid for i in range(cdims[d])]

    def elem(idx):
        flat = 0
        for d, i in enumerate(idx):
            flat = flat * shape[d] + i
        return values[flat]

    for coord in grid:
        key = '0' if not shape else '.'.join(str(c) for c in coord)
        if key in skip_chunks:
            continue
        # gather the FULL chunk (zarr v2 pads edge chunks with fill)
        if not shape:
            chunk_vals = [values[0]]
        else:
            idxs = [()]
            for d in range(len(shape)):
                base = coord[d] * chunks[d]
                idxs = [g + (base + i,) for g in idxs
                        for i in range(chunks[d])]
            chunk_vals = [elem(i) if all(i[d] < shape[d]
                                         for d in range(len(shape)))
                          else fill_value for i in idxs]
        if is_obj:
            raw = vlen_utf8([v if isinstance(v, str) else '' for v in
                             chunk_vals])
            typesize = 1
        else:
            fmt, esize = DT_PACK[dtype]
            raw = b''.join(struct.pack(fmt, v if fmt[-1] in 'fd' else int(v))
                           for v in chunk_vals)
            typesize = esize
        if compressor is None:
            enc = raw
        elif compressor == 'zlib':
            enc = zlib.compress(raw, 5)
            assert zlib.decompress(enc) == raw
        else:
            enc = blosc_encode(raw, typesize,
                               cname=compressor.split('-')[1],
                               blocksize=blocksize,
                               force_memcpy=force_memcpy)
            assert blosc_decode(enc) == raw, (rel, key)
        with open(os.path.join(root, rel, key), 'wb') as f:
            f.write(enc)


def categorical(root, rel, codes, categories, ordered=False):
    write_group(root, rel, {'encoding-type': 'categorical',
                            'encoding-version': '0.2.0', 'ordered': ordered})
    write_array(root, os.path.join(rel, 'codes'), (len(codes),),
                (max(1, min(len(codes), 128)),), '|i1', codes,
                {'encoding-type': 'array', 'encoding-version': '0.2.0'})
    write_array(root, os.path.join(rel, 'categories'), (len(categories),),
                (len(categories),), '|O', categories,
                {'encoding-type': 'string-array',
                 'encoding-version': '0.2.0'}, compressor=None)


ENC = lambda t, v: {'encoding-type': t, 'encoding-version': v}


def main(path):
    n_obs, n_var = 300, 40
    if os.path.exists(path):
        shutil.rmtree(path)
    write_group(path, '', ENC('anndata', '0.1.0'))

    # ---- obs (dataframe): vlen-utf8 index, categorical, i8, f8
    obs_attrs = dict(ENC('dataframe', '0.2.0'), _index='_index',
                     **{'column-order': ['cell_type', 'n_genes', 'score']})
    write_group(path, 'obs', obs_attrs)
    write_array(path, 'obs/_index', (n_obs,), (128,), '|O',
                ['cell%d' % i for i in range(n_obs)],
                ENC('string-array', '0.2.0'))
    categorical(path, 'obs/cell_type', [i % 4 for i in range(n_obs)],
                ['type_%d' % t for t in range(4)])
    write_array(path, 'obs/n_genes', (n_obs,), (128,), '<i8',
                [(i * 7) % 50 for i in range(n_obs)], ENC('array', '0.2.0'))
    write_array(path, 'obs/score', (n_obs,), (128,), '<f8',
                [((i * 3) % 11) * 0.25 for i in range(n_obs)],
                ENC('array', '0.2.0'))

    # ---- var: raw (null-compressor) bool column exercises that path
    var_attrs = dict(ENC('dataframe', '0.2.0'), _index='_index',
                     **{'column-order': ['highly_variable']})
    write_group(path, 'var', var_attrs)
    write_array(path, 'var/_index', (n_var,), (n_var,), '|O',
                ['gene%d' % j for j in range(n_var)],
                ENC('string-array', '0.2.0'))
    write_array(path, 'var/highly_variable', (n_var,), (n_var,), '|b1',
                [1 if j % 3 == 0 else 0 for j in range(n_var)],
                ENC('array', '0.2.0'), compressor=None)

    # ---- X: csr_matrix, split+shuffle lz4 (the real c-blosc default shape)
    data, indices, indptr = [], [], [0]
    for i in range(n_obs):
        for j in range(n_var):
            if (i * 5 + j * 11) % 23 == 0:
                data.append(((i * 2 + j * 13) % 19) * 0.5)
                indices.append(j)
        indptr.append(len(data))
    write_group(path, 'X', dict(ENC('csr_matrix', '0.1.0'),
                                shape=[n_obs, n_var]))
    write_array(path, 'X/data', (len(data),), (256,), '<f8', data,
                ENC('array', '0.2.0'), blocksize=1024)  # 2 blocks, split
    write_array(path, 'X/indices', (len(indices),), (256,), '<i4', indices,
                ENC('array', '0.2.0'), blocksize=1024)
    write_array(path, 'X/indptr', (len(indptr),), (len(indptr),), '<i8',
                indptr, ENC('array', '0.2.0'))

    # ---- layers/log: dense 2-D, multi-chunk both dims
    write_group(path, 'layers', ENC('dict', '0.1.0'))
    write_array(path, 'layers/log', (n_obs, n_var), (64, 16), '<f8',
                [((i * 17 + j * 3) % 29) * 0.25
                 for i in range(n_obs) for j in range(n_var)],
                ENC('array', '0.2.0'), blocksize=1024)

    # ---- obsm/X_pca: plain-zlib compressor path
    write_group(path, 'obsm', ENC('dict', '0.1.0'))
    write_array(path, 'obsm/X_pca', (n_obs, 5), (100, 5), '<f8',
                [((i * 13 + k * 7) % 37) * 0.5
                 for i in range(n_obs) for k in range(5)],
                ENC('array', '0.2.0'), compressor='zlib')

    # ---- uns: scalars, an array with an ABSENT chunk (fill_value), memcpy
    write_group(path, 'uns', ENC('dict', '0.1.0'))
    write_array(path, 'uns/n_bins', (), (), '<i8', [42],
                ENC('numeric-scalar', '0.2.0'))
    write_array(path, 'uns/method', (), (), '|O', ['zheng17'],
                ENC('string', '0.2.0'))
    write_array(path, 'uns/rank', (8,), (5,), '<f8',
                [(k * 5 % 13) * 0.5 for k in range(8)],
                ENC('array', '0.2.0'), fill_value=9.0, skip_chunks=('1',))
    write_array(path, 'uns/flat', (6,), (6,), '<f8',
                [k * 0.5 for k in range(6)],
                ENC('array', '0.2.0'), force_memcpy=True)
    print('wrote', path)


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'fixtures/zarr/pbmc.zarr')
