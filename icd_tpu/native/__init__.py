"""Native (C++) components: RLE mask kernels with ctypes bindings."""
