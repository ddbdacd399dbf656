"""``python -m sspslam_tpu.native.build`` — compile the native host library."""

from . import build, AVAILABLE

if __name__ == "__main__":
    ok = build(verbose=True)
    print("native library " + ("built and loaded" if ok else "BUILD FAILED"))
