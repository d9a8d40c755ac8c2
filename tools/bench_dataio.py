"""Native C++ loader vs PIL: decode+resize throughput on host.

The reference decodes with PIL inside torch DataLoader workers
(reference src/data_loader/GeneralDataset.py:38-59). Here the C++ loader
(native/dataio.cpp: libjpeg/libpng/BMP + triangle resize + pthread batch)
feeds the uint8 host->device path.

Run:  PYTHONPATH=. python tools/bench_dataio.py
"""

import os
import tempfile
import time

import numpy as np


def main():
    from PIL import Image

    from vit_ad_tpu.data import native

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(64):
        arr = rng.integers(0, 255, size=(700, 700, 3), dtype=np.uint8)
        p = os.path.join(tmp, f"im{i}.png" if i % 2 else f"im{i}.jpg")
        Image.fromarray(arr).save(p)
        paths.append(p)

    img = 224
    if native.get_lib() is None:
        print("native lib unavailable")
        return

    # warm (file cache + lib init)
    native.load_batch(paths, img)

    t0 = time.perf_counter()
    for _ in range(3):
        batch = native.load_batch(paths, img)
    t_native = (time.perf_counter() - t0) / 3
    assert batch.shape == (64, img, img, 3)

    t0 = time.perf_counter()
    for _ in range(3):
        out = np.stack([
            np.asarray(
                Image.open(p).convert("RGB").resize((img, img), Image.BILINEAR)
            )
            for p in paths
        ])
    t_pil = (time.perf_counter() - t0) / 3

    import os as _os

    print(
        f"decode+resize 64x 700px -> 224px ({_os.cpu_count()} core(s)): "
        f"native {t_native*1e3:.0f} ms ({64/t_native:.0f} img/s)  "
        f"PIL {t_pil*1e3:.0f} ms ({64/t_pil:.0f} img/s)  "
        f"speedup {t_pil/t_native:.1f}x"
    )
    # On this 1-core box the pthread fan-out cannot engage (n_threads=1) and
    # plain libjpeg decodes at parity with PIL's libjpeg-turbo; the batch
    # entry point scales with cores on real hosts and holds the GIL for
    # none of the decode.


if __name__ == "__main__":
    main()
