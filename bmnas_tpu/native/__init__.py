from bmnas_tpu.native.loader import NativeNpyLoader, native_available  # noqa: F401
