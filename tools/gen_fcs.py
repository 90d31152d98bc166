#!/usr/bin/env python3
"""Deterministic FCS 3.0 fixture writer, Python stdlib only.

Flow Cytometry Standard (public spec, ISAC FCS3.0/3.1): a 58-byte
ASCII header with segment offsets, a delimited TEXT segment of
$-keywords, and a DATA segment — here list-mode ($MODE L) float32
little-endian ($DATATYPE F, $BYTEORD 1,2,3,4).

Closed-form content (mirrored by the a11 oracle and FcsSpec):
  channels = FSC, SSC, FL1, FL2  (n_par = 4)
  n_events = 500
  value[e][p] = ((e*7 + p*13) % 101) * 0.25   (exact quarters)

Usage: python3 tools/gen_fcs.py fixtures/fcs
"""
import os
import struct
import sys

N_EVENTS = 500
CHANNELS = ['FSC', 'SSC', 'FL1', 'FL2']


def value(e, p):
    return ((e * 7 + p * 13) % 101) * 0.25


def build_text(data_start, data_end):
    kv = {
        '$BEGINANALYSIS': '0', '$ENDANALYSIS': '0',
        '$BEGINSTEXT': '0', '$ENDSTEXT': '0',
        '$BEGINDATA': str(data_start), '$ENDDATA': str(data_end),
        '$BYTEORD': '1,2,3,4', '$DATATYPE': 'F', '$MODE': 'L',
        '$NEXTDATA': '0',
        '$PAR': str(len(CHANNELS)), '$TOT': str(N_EVENTS),
    }
    for i, name in enumerate(CHANNELS, start=1):
        kv[f'$P{i}N'] = name
        kv[f'$P{i}B'] = '32'
        kv[f'$P{i}E'] = '0,0'
        kv[f'$P{i}R'] = '1024'
    parts = ['/']
    for k in sorted(kv):
        parts.append(f'{k}/{kv[k]}/')
    return ''.join(parts).encode('ascii')


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else 'fixtures/fcs'
    os.makedirs(out, exist_ok=True)
    data = b''.join(
        struct.pack('<f', value(e, p))
        for e in range(N_EVENTS) for p in range(len(CHANNELS)))
    # two-pass: TEXT length depends on data offsets; offsets stabilize
    text_start = 58
    data_start, data_end = 0, 0
    for _ in range(3):
        text = build_text(data_start, data_end)
        text_end = text_start + len(text) - 1
        new_start = text_end + 1
        new_end = new_start + len(data) - 1
        if (new_start, new_end) == (data_start, data_end):
            break
        data_start, data_end = new_start, new_end
    header = (b'FCS3.0    '
              + f'{text_start:>8d}'.encode() + f'{text_end:>8d}'.encode()
              + f'{data_start:>8d}'.encode() + f'{data_end:>8d}'.encode()
              + f'{0:>8d}'.encode() + f'{0:>8d}'.encode())
    assert len(header) == 58
    path = os.path.join(out, 'events.fcs')
    with open(path, 'wb') as f:
        f.write(header + text + data)
    print(f'{path}: {58 + len(text) + len(data)} bytes')


if __name__ == '__main__':
    main()
