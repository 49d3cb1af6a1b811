"""Generate the Python-side half of the cross-implementation golden pair.

Builds a single xor8 filter over 10k string keys (and one over 10k u64
keys) using the Rust-DefaultHasher-compatible siphash13 digest path, and
writes raw ^TL2 V2 files with an EMPTY hasher payload — exactly the bytes
the reference's ``Xor8::<BuildHasherDefault>::write_file`` produces
(/root/reference/src/xor8/filter.rs:262-279; BuildHasherDefault serializes
to empty bytes, src/hasher.rs:8-33).

The Rust half (tools/rust_golden.rs, run once with the reference crate)
parses these files with ``Xor8::from_bytes`` and asserts membership; its
output is committed as tests/golden/rust-parse-report.json.

Run:  python tools/gen_golden_input.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xorfilter_spark.codec import write_filter_file
from xorfilter_spark.hashing import siphash13_batch, siphash13_batch_rust_str
from xorfilter_spark.kernels.xor8 import build_xor8, lookup_xor8

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden")
N = 10_000


def main() -> None:
    os.makedirs(GOLDEN, exist_ok=True)
    report = {}

    # string keys, Rust &str Hash semantics (utf-8 + 0xFF)
    keys = [f"key-{i:05d}" for i in range(N)]
    misses = [f"miss-{i:05d}" for i in range(N)]
    d = siphash13_batch_rust_str(keys)
    r = build_xor8(d)
    path = os.path.join(GOLDEN, "py-xor8-v2-str.tl2")
    write_filter_file(path, r["seed"], r["block_length"], r["fingerprints"].tobytes())
    dm = siphash13_batch_rust_str(misses)
    fp = np.frombuffer(r["fingerprints"].tobytes(), dtype=np.uint8)
    member_ok = bool(lookup_xor8(d, r["seed"], r["block_length"], fp).all())
    miss_hits = [int(i) for i in
                 np.nonzero(lookup_xor8(dm, r["seed"], r["block_length"], fp))[0]]
    report["py_str"] = {
        "file": os.path.basename(path),
        "n_keys": N,
        "seed": int(r["seed"]),
        "block_length": int(r["block_length"]),
        "members_all_true": member_ok,
        "miss_hit_indices": miss_hits,
    }

    # u64 keys 0..N, Rust u64 Hash semantics (8 LE bytes)
    du = siphash13_batch([int(i).to_bytes(8, "little") for i in range(N)])
    ru = build_xor8(du)
    path_u = os.path.join(GOLDEN, "py-xor8-v2-u64.tl2")
    write_filter_file(path_u, ru["seed"], ru["block_length"], ru["fingerprints"].tobytes())
    dmu = siphash13_batch([int(i).to_bytes(8, "little") for i in range(N, 2 * N)])
    fpu = np.frombuffer(ru["fingerprints"].tobytes(), dtype=np.uint8)
    report["py_u64"] = {
        "file": os.path.basename(path_u),
        "n_keys": N,
        "seed": int(ru["seed"]),
        "block_length": int(ru["block_length"]),
        "members_all_true": bool(
            lookup_xor8(du, ru["seed"], ru["block_length"], fpu).all()
        ),
        "miss_hit_indices": [int(i) for i in
                             np.nonzero(lookup_xor8(dmu, ru["seed"], ru["block_length"], fpu))[0]],
    }

    with open(os.path.join(GOLDEN, "py-golden.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: {kk: (vv if not isinstance(vv, list) else len(vv))
                          for kk, vv in v.items()} for k, v in report.items()}))


if __name__ == "__main__":
    main()
