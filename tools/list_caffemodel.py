"""List layers/blobs of a .caffemodel — the `convert_caffe_ron.py` parameter
lister (ref: convert_caffe_ron.py:42-53), without a caffe installation.

Usage: python tools/list_caffemodel.py model.caffemodel
"""

import sys

from ron_tensorflow_tpu.train.caffe_import import parse_caffemodel


def main(path: str) -> int:
    layers = parse_caffemodel(path)
    for name, (ltype, blobs) in layers.items():
        shapes = ", ".join(str(tuple(b.shape)) for b in blobs)
        print(f"{name:40s} {ltype:20s} blobs: {shapes}")
    print(f"{len(layers)} layers with parameters")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
