"""Native (C++) host-side components, bound via ctypes."""
