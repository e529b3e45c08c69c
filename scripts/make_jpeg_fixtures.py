#!/usr/bin/env python
"""Generate the committed JPEG fixtures + expected-pixel sidecar.

The .jpg files are produced by the test-side minimal encoder
(tests/test_jpeg.py) and the expected pixel truths by its INDEPENDENT
direct-IDCT reference reconstruction — NOT by the engine's decoder — so
the sidecar is ground truth the registry query can be oracle-checked
against (queries_pipeline.q_image_decode_jpeg). Deterministic: seeded
numpy, byte-stable output; re-running must be a no-op diff.
"""

from __future__ import annotations

import csv
import hashlib
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from test_jpeg import _reconstruct, encode_jpeg  # noqa: E402

OUT = os.path.join(
    ROOT,
    "the_build_project_image_retrieval_with_vector_databases_spark",
    "fixtures",
    "images_jpeg",
)


def main() -> None:
    rng = np.random.RandomState(42)
    fixtures = []

    rgb = rng.randint(0, 256, (17, 24, 3), dtype=np.uint8)
    fixtures.append(("cat_a", "f444.jpg", rgb, {}))

    rgb = rng.randint(0, 256, (24, 33, 3), dtype=np.uint8)
    fixtures.append(("cat_a", "f420.jpg", rgb, {"subsample": True}))

    gx = np.tile(np.arange(40, dtype=np.uint8) * 6, (32, 1))
    rgb = np.stack([gx, gx[:, ::-1], gx // 2], axis=2)
    fixtures.append(("cat_b", "gradient_rst.jpg", rgb, {"restart_interval": 2}))

    rows = []
    for category, name, rgb, kw in fixtures:
        jpeg, coefs, sampling = encode_jpeg(rgb, **kw)
        want = _reconstruct(coefs, sampling, rgb.shape[0], rgb.shape[1])
        # The registry oracle locates SOF0 with strpos(hex, 'ffc0') —
        # first match, byte-alignment-guarded but NOT a marker walk. Pin
        # the assumption at generation time: the first 'ffc0' in the hex
        # stream must BE the real frame header (no earlier straddled or
        # payload-embedded occurrence), else the oracle would parse
        # garbage dims and the driver row would go red confusingly.
        hx = jpeg.hex()
        true_sof = hx.index("ffc0")
        assert true_sof == 2 * jpeg.index(b"\xff\xc0"), (
            f"{name}: first hex 'ffc0' at {true_sof} is not the SOF0 "
            "marker — regenerate with different content or teach the "
            "oracle a real marker walk"
        )
        d = os.path.join(OUT, category)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, name), "wb") as f:
            f.write(jpeg)
        rows.append(
            dict(
                basename=name,
                category=category,
                width=rgb.shape[1],
                height=rgb.shape[0],
                n_channels=3,
                r0=int(want[0, 0, 0]),
                g0=int(want[0, 0, 1]),
                b0=int(want[0, 0, 2]),
                pixel_md5=hashlib.md5(want.tobytes()).hexdigest(),
                decode_ok=True,
            )
        )

    # a progressive (SOF2) file: well-formed container, unsupported coding
    # → the decode_ok = false row (F2 error tolerance, no job failure)
    base, _, _ = encode_jpeg(np.full((8, 8, 3), 77, dtype=np.uint8))
    bad = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    d = os.path.join(OUT, "cat_b")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "progressive.jpg"), "wb") as f:
        f.write(bad)
    rows.append(
        dict(
            basename="progressive.jpg",
            category="cat_b",
            width="",
            height="",
            n_channels="",
            r0="",
            g0="",
            b0="",
            pixel_md5="",
            decode_ok=False,
        )
    )

    with open(os.path.join(OUT, "expected.csv"), "w", newline="") as f:
        wr = csv.DictWriter(f, fieldnames=list(rows[0]))
        wr.writeheader()
        wr.writerows(rows)
    print(f"wrote {len(rows)} fixtures under {OUT}")


if __name__ == "__main__":
    main()
