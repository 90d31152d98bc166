#!/usr/bin/env python3
"""Deterministic SpatialData-on-zarr fixture generator (no spatialdata deps).

Writes the public spatialdata zarr layout (a zarr v2 store whose root
attrs carry `spatialdata_attrs` — the detection key the reference uses,
`core/storage/_backed_access.py:118`):

  tables/table        anndata group (the surface the reference's
                      SpatialDataAccessor exposes)
  points/transcripts  NGFF points element: parquet dataset + zarr attrs
  images/cells        NGFF multiscales image (c,y,x), 2 pyramid levels
  labels/segmentation NGFF labels (y,x), int32

Closed forms (mirrored by the a20/a21 DuckDB oracles + SpatialZarrSpec):
  table: n_obs=150, n_var=12
    obs: _index 'cell{i}', region cat 'cells', n_spots (i*11)%40
    var: _index 'gene{j}'
    X csr: mask (i*3 + j*7) % 11 == 0, value ((i + j*5) % 13) * 0.5
  points: 2000 rows: x=(p*37 % 640)*0.25, y=(p*53 % 480)*0.25,
          gene='g{p%25}'
  image (3,64,64) u1 level 0: ((c*31 + y*7 + x*3) % 256)
        (3,32,32)    level 1: ((c*31 + 2*y*7 + 2*x*3) % 256) (2x stride)
  labels (64,64) i4: (y//8)*8 + (x//8)
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_zarr import write_group, write_array, categorical, ENC  # noqa: E402

import pyarrow as pa  # noqa: E402  (driver-side tooling only)
import pyarrow.parquet as pq  # noqa: E402


def main(path):
    if os.path.exists(path):
        shutil.rmtree(path)
    write_group(path, '', {
        'spatialdata_attrs': {'spatialdata_software_version': '0.2.0'}})

    # ---------------------------------------------------- tables/table
    n_obs, n_var = 150, 12
    write_group(path, 'tables', {})
    write_group(path, 'tables/table', ENC('anndata', '0.1.0'))
    obs_attrs = dict(ENC('dataframe', '0.2.0'), _index='_index',
                     **{'column-order': ['region', 'n_spots']})
    write_group(path, 'tables/table/obs', obs_attrs)
    write_array(path, 'tables/table/obs/_index', (n_obs,), (64,), '|O',
                ['cell%d' % i for i in range(n_obs)],
                ENC('string-array', '0.2.0'))
    categorical(path, 'tables/table/obs/region', [0] * n_obs, ['cells'])
    write_array(path, 'tables/table/obs/n_spots', (n_obs,), (64,), '<i8',
                [(i * 11) % 40 for i in range(n_obs)], ENC('array', '0.2.0'))
    var_attrs = dict(ENC('dataframe', '0.2.0'), _index='_index',
                     **{'column-order': []})
    write_group(path, 'tables/table/var', var_attrs)
    write_array(path, 'tables/table/var/_index', (n_var,), (n_var,), '|O',
                ['gene%d' % j for j in range(n_var)],
                ENC('string-array', '0.2.0'))
    data, indices, indptr = [], [], [0]
    for i in range(n_obs):
        for j in range(n_var):
            if (i * 3 + j * 7) % 11 == 0:
                data.append(((i + j * 5) % 13) * 0.5)
                indices.append(j)
        indptr.append(len(data))
    write_group(path, 'tables/table/X',
                dict(ENC('csr_matrix', '0.1.0'), shape=[n_obs, n_var]))
    write_array(path, 'tables/table/X/data', (len(data),), (256,), '<f8',
                data, ENC('array', '0.2.0'))
    write_array(path, 'tables/table/X/indices', (len(indices),), (256,),
                '<i4', indices, ENC('array', '0.2.0'))
    write_array(path, 'tables/table/X/indptr', (len(indptr),),
                (len(indptr),), '<i8', indptr, ENC('array', '0.2.0'))

    # ----------------------------------------------- points/transcripts
    write_group(path, 'points', {})
    write_group(path, 'points/transcripts', {
        'encoding-type': 'ngff:points', 'axes': ['x', 'y'],
        'spatialdata_attrs': {'feature_key': 'gene', 'version': '0.1'}})
    n_pts = 2000
    tbl = pa.table({
        'x': pa.array([(p * 37 % 640) * 0.25 for p in range(n_pts)],
                      type=pa.float64()),
        'y': pa.array([(p * 53 % 480) * 0.25 for p in range(n_pts)],
                      type=pa.float64()),
        'gene': pa.array(['g%d' % (p % 25) for p in range(n_pts)])})
    pdir = os.path.join(path, 'points/transcripts/points.parquet')
    os.makedirs(pdir, exist_ok=True)
    pq.write_table(tbl, os.path.join(pdir, 'part-0.parquet'))

    # --------------------------------------------------- images/cells
    c, h, w = 3, 64, 64
    write_group(path, 'images', {})
    write_group(path, 'images/cells', {
        'multiscales': [{
            'version': '0.4',
            'axes': [{'name': 'c', 'type': 'channel'},
                     {'name': 'y', 'type': 'space'},
                     {'name': 'x', 'type': 'space'}],
            'datasets': [
                {'path': '0', 'coordinateTransformations':
                    [{'type': 'scale', 'scale': [1.0, 1.0, 1.0]}]},
                {'path': '1', 'coordinateTransformations':
                    [{'type': 'scale', 'scale': [1.0, 2.0, 2.0]}]}]}]})
    write_array(path, 'images/cells/0', (c, h, w), (1, 32, 32), '|u1',
                [(ci * 31 + y * 7 + x * 3) % 256
                 for ci in range(c) for y in range(h) for x in range(w)],
                None, compressor='zlib')
    write_array(path, 'images/cells/1', (c, h // 2, w // 2), (1, 32, 32),
                '|u1',
                [(ci * 31 + 2 * y * 7 + 2 * x * 3) % 256
                 for ci in range(c) for y in range(h // 2)
                 for x in range(w // 2)],
                None, compressor='zlib')

    # ---------------------------------------------- labels/segmentation
    write_group(path, 'labels', {})
    write_group(path, 'labels/segmentation', {
        'multiscales': [{
            'version': '0.4',
            'axes': [{'name': 'y', 'type': 'space'},
                     {'name': 'x', 'type': 'space'}],
            'datasets': [{'path': '0'}]}],
        'image-label': {'version': '0.4'}})
    write_array(path, 'labels/segmentation/0', (h, w), (32, 32), '<i4',
                [(y // 8) * 8 + (x // 8) for y in range(h)
                 for x in range(w)],
                None, compressor='zlib')

    print('wrote', path)


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else
         'fixtures/zarr/spatial.zarr')
