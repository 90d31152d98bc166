#!/usr/bin/env python3
"""Deterministic AnnData-on-zarr-v3 fixture generator (no zarr deps).

Writes a zarr v3 directory store per the public zarr v3 core spec: one
`zarr.json` per node, `c/`-separated chunk keys, codec pipelines
(`bytes`, `blosc`, `gzip`, `crc32c`, `vlen-utf8`), and the
`sharding_indexed` codec — inner chunks packed into one shard object
with a trailing (offset, nbytes) u64 index + crc32c. The root
`zarr.json` also carries `consolidated_metadata` covering every node,
so readers can plan the whole store from one GET.

Closed forms are IDENTICAL to tools/gen_zarr.py's pbmc.zarr (the a19
oracle mirrors a12's):
  n_obs=300, n_var=40
  obs: _index 'cell{i}', cell_type cat 'type_{i%4}', n_genes (i*7)%50,
       score ((i*3)%11)*0.25
  var: _index 'gene{j}', highly_variable (j%3==0)
  X (csr): mask (i*5 + j*11) % 23 == 0, value ((i*2 + j*13) % 19) * 0.5
  layers/log (dense, SHARDED): ((i*17 + j*3) % 29) * 0.25
  obsm/X_pca (300x5, gzip, v2 key encoding): ((i*13 + k*7) % 37) * 0.5
  uns: n_bins=42 (i8 0-d), method='zheng17' (string 0-d),
       rank f8[8] SHARDED (shard 10, inner 5): k<5 -> (k*5 % 13)*0.5,
       inner chunk 1 ABSENT (index -1) -> fill_value 9.0
Blosc chunks reuse gen_zarr.py's from-scratch c-blosc1/LZ4 encoder and
are decode-asserted in place.
"""
import gzip
import json
import os
import shutil
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_zarr import blosc_encode, blosc_decode, vlen_utf8, DT_PACK  # noqa: E402

# ------------------------------------------------------------------ crc32c

_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# ------------------------------------------------------------------- store

V3_DT = {'<f8': 'float64', '<f4': 'float32', '<i8': 'int64',
         '<i4': 'int32', '<i2': 'int16', '|i1': 'int8', '|u1': 'uint8',
         '|b1': 'bool', '|O': 'string'}

NODES = {}  # rel -> zarr.json object (collected for consolidation)


def write_json(root, rel, obj):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, 'w') as f:
        json.dump(obj, f, indent=1, sort_keys=True)


def group(root, rel, attrs):
    node = {'zarr_format': 3, 'node_type': 'group'}
    if attrs:
        node['attributes'] = attrs
    NODES[rel] = node
    write_json(root, os.path.join(rel, 'zarr.json'), node)


def encode_raw(dtype, chunk_vals):
    if dtype == '|O':
        return vlen_utf8([v if isinstance(v, str) else '' for v in chunk_vals]), 1
    fmt, esize = DT_PACK[dtype]
    return b''.join(struct.pack(fmt, v if fmt[-1] in 'fd' else int(v))
                    for v in chunk_vals), esize


def apply_codecs(raw, typesize, codecs):
    """codecs: subset of ['blosc', 'gzip', 'crc32c'] in encode order."""
    out = raw
    for c in codecs:
        if c == 'blosc':
            out = blosc_encode(out, typesize)
            assert blosc_decode(out) == raw
        elif c == 'gzip':
            out = gzip.compress(out, 5, mtime=0)  # deterministic bytes
        elif c == 'crc32c':
            out = out + struct.pack('<I', crc32c(out))
    return out


def codec_meta(dtype, codecs):
    meta = []
    if dtype == '|O':
        meta.append({'name': 'vlen-utf8'})
    else:
        meta.append({'name': 'bytes', 'configuration': {'endian': 'little'}})
    for c in codecs:
        if c == 'blosc':
            meta.append({'name': 'blosc', 'configuration': {
                'cname': 'lz4', 'clevel': 5, 'shuffle': 'shuffle',
                'typesize': DT_PACK[dtype][1] if dtype != '|O' else 1,
                'blocksize': 0}})
        elif c == 'gzip':
            meta.append({'name': 'gzip', 'configuration': {'level': 5}})
        elif c == 'crc32c':
            meta.append({'name': 'crc32c'})
    return meta


def grid(shape, chunks):
    if not shape:
        return [()]
    dims = [(shape[d] + chunks[d] - 1) // chunks[d] for d in range(len(shape))]
    g = [()]
    for d in range(len(shape)):
        g = [c + (i,) for c in g for i in range(dims[d])]
    return g


def gather_chunk(shape, chunks, values, coord, fill):
    """FULL chunk values in C order (edges padded with fill)."""
    if not shape:
        return [values[0]]
    idxs = [()]
    for d in range(len(shape)):
        base = coord[d] * chunks[d]
        idxs = [g + (base + i,) for g in idxs for i in range(chunks[d])]

    def elem(idx):
        flat = 0
        for d, i in enumerate(idx):
            flat = flat * shape[d] + i
        return values[flat]
    return [elem(i) if all(i[d] < shape[d] for d in range(len(shape)))
            else fill for i in idxs]


def array(root, rel, shape, chunks, dtype, values, attrs, codecs=(),
          fill=0, shard_inner=None, skip_inner=(), key_enc='default'):
    """chunks = store-object grid (the SHARD shape when shard_inner set)."""
    node = {
        'zarr_format': 3, 'node_type': 'array',
        'shape': list(shape), 'data_type': V3_DT[dtype],
        'chunk_grid': {'name': 'regular',
                       'configuration': {'chunk_shape': list(chunks)}},
        'chunk_key_encoding': (
            {'name': 'default', 'configuration': {'separator': '/'}}
            if key_enc == 'default' else
            {'name': 'v2', 'configuration': {'separator': '.'}}),
        'fill_value': fill,
    }
    if shard_inner is None:
        node['codecs'] = codec_meta(dtype, codecs)
    else:
        node['codecs'] = [{'name': 'sharding_indexed', 'configuration': {
            'chunk_shape': list(shard_inner),
            'codecs': codec_meta(dtype, codecs),
            'index_codecs': [{'name': 'bytes',
                              'configuration': {'endian': 'little'}},
                             {'name': 'crc32c'}],
            'index_location': 'end'}}]
    if attrs:
        node['attributes'] = attrs
    NODES[rel] = node
    write_json(root, os.path.join(rel, 'zarr.json'), node)

    def chunk_key(coord):
        if key_enc == 'default':
            return 'c' if not coord else 'c/' + '/'.join(map(str, coord))
        return '0' if not coord else '.'.join(map(str, coord))

    for coord in grid(shape, chunks):
        key = chunk_key(coord)
        p = os.path.join(root, rel, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        if shard_inner is None:
            vals = gather_chunk(shape, chunks, values, coord, fill)
            raw, tsz = encode_raw(dtype, vals)
            with open(p, 'wb') as f:
                f.write(apply_codecs(raw, tsz, codecs))
        else:
            # one shard object: encoded inner chunks + u64 index + crc32c
            ips = [chunks[d] // shard_inner[d] for d in range(len(chunks))]
            inner_coords = grid([c for c in chunks], shard_inner)
            body = b''
            index = []
            for k, iw in enumerate(inner_coords):
                gcoord = tuple(coord[d] * ips[d] + iw[d]
                               for d in range(len(chunks)))
                if gcoord in skip_inner:
                    index.append((2**64 - 1, 2**64 - 1))
                    continue
                # inner chunk gathered from the GLOBAL grid of shard_inner
                vals = gather_chunk(shape, shard_inner, values, gcoord, fill)
                raw, tsz = encode_raw(dtype, vals)
                enc = apply_codecs(raw, tsz, codecs)
                index.append((len(body), len(enc)))
                body += enc
            idx = b''.join(struct.pack('<QQ', o, n) for o, n in index)
            with open(p, 'wb') as f:
                f.write(body + idx + struct.pack('<I', crc32c(idx)))


def categorical(root, rel, codes, categories):
    group(root, rel, {'encoding-type': 'categorical',
                      'encoding-version': '0.2.0', 'ordered': False})
    array(root, os.path.join(rel, 'codes'), (len(codes),),
          (max(1, min(len(codes), 128)),), '|i1', codes,
          {'encoding-type': 'array', 'encoding-version': '0.2.0'},
          codecs=('blosc',))
    array(root, os.path.join(rel, 'categories'), (len(categories),),
          (len(categories),), '|O', categories,
          {'encoding-type': 'string-array', 'encoding-version': '0.2.0'})


ENC = lambda t, v: {'encoding-type': t, 'encoding-version': v}  # noqa: E731


def main(path):
    n_obs, n_var = 300, 40
    if os.path.exists(path):
        shutil.rmtree(path)
    NODES.clear()
    group(path, '', ENC('anndata', '0.1.0'))

    obs_attrs = dict(ENC('dataframe', '0.2.0'), _index='_index',
                     **{'column-order': ['cell_type', 'n_genes', 'score']})
    group(path, 'obs', obs_attrs)
    array(path, 'obs/_index', (n_obs,), (128,), '|O',
          ['cell%d' % i for i in range(n_obs)],
          ENC('string-array', '0.2.0'), codecs=('gzip',))
    categorical(path, 'obs/cell_type', [i % 4 for i in range(n_obs)],
                ['type_%d' % t for t in range(4)])
    array(path, 'obs/n_genes', (n_obs,), (128,), '<i8',
          [(i * 7) % 50 for i in range(n_obs)], ENC('array', '0.2.0'),
          codecs=('blosc',))
    array(path, 'obs/score', (n_obs,), (128,), '<f8',
          [((i * 3) % 11) * 0.25 for i in range(n_obs)],
          ENC('array', '0.2.0'), codecs=('gzip', 'crc32c'))

    var_attrs = dict(ENC('dataframe', '0.2.0'), _index='_index',
                     **{'column-order': ['highly_variable']})
    group(path, 'var', var_attrs)
    array(path, 'var/_index', (n_var,), (n_var,), '|O',
          ['gene%d' % j for j in range(n_var)], ENC('string-array', '0.2.0'))
    array(path, 'var/highly_variable', (n_var,), (n_var,), '|b1',
          [1 if j % 3 == 0 else 0 for j in range(n_var)],
          ENC('array', '0.2.0'))

    # ---- X: csr, data/indices SHARDED (shard 512 elems, inner 128)
    data, indices, indptr = [], [], [0]
    for i in range(n_obs):
        for j in range(n_var):
            if (i * 5 + j * 11) % 23 == 0:
                data.append(((i * 2 + j * 13) % 19) * 0.5)
                indices.append(j)
        indptr.append(len(data))
    group(path, 'X', dict(ENC('csr_matrix', '0.1.0'), shape=[n_obs, n_var]))
    array(path, 'X/data', (len(data),), (512,), '<f8', data,
          ENC('array', '0.2.0'), codecs=('blosc',), shard_inner=(128,))
    array(path, 'X/indices', (len(indices),), (512,), '<i4', indices,
          ENC('array', '0.2.0'), codecs=('blosc',), shard_inner=(128,))
    array(path, 'X/indptr', (len(indptr),), (len(indptr),), '<i8', indptr,
          ENC('array', '0.2.0'), codecs=('gzip',))

    # ---- layers/log: dense 2-D SHARDED (shard (100,20), inner (25,10))
    group(path, 'layers', ENC('dict', '0.1.0'))
    array(path, 'layers/log', (n_obs, n_var), (100, 20), '<f8',
          [((i * 17 + j * 3) % 29) * 0.25
           for i in range(n_obs) for j in range(n_var)],
          ENC('array', '0.2.0'), codecs=('blosc',), shard_inner=(25, 10))

    # ---- obsm/X_pca: gzip, v2-style chunk keys inside a v3 store
    group(path, 'obsm', ENC('dict', '0.1.0'))
    array(path, 'obsm/X_pca', (n_obs, 5), (100, 5), '<f8',
          [((i * 13 + k * 7) % 37) * 0.5
           for i in range(n_obs) for k in range(5)],
          ENC('array', '0.2.0'), codecs=('gzip',), key_enc='v2')

    # ---- uns: 0-d scalars, sharded array with an ABSENT inner chunk
    group(path, 'uns', ENC('dict', '0.1.0'))
    array(path, 'uns/n_bins', (), (), '<i8', [42],
          ENC('numeric-scalar', '0.2.0'))
    array(path, 'uns/method', (), (), '|O', ['zheng17'],
          ENC('string', '0.2.0'))
    array(path, 'uns/rank', (8,), (10,), '<f8',
          [(k * 5 % 13) * 0.5 for k in range(8)],
          ENC('array', '0.2.0'), fill=9.0, shard_inner=(5,),
          skip_inner=((1,),))
    array(path, 'uns/mask', (6,), (6,), '|b1',
          [1, 0, 1, 1, 0, 1], ENC('array', '0.2.0'))

    # ---- v3 consolidated metadata: every node inlined in root zarr.json
    root_node = dict(NODES[''])
    root_node['consolidated_metadata'] = {
        'kind': 'inline', 'must_understand': False,
        'metadata': {rel: NODES[rel] for rel in sorted(NODES) if rel}}
    write_json(path, 'zarr.json', root_node)
    print('wrote', path, '(%d nodes)' % len(NODES))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'fixtures/zarr/pbmc_v3.zarr')
