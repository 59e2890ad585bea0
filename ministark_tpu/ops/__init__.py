"""Device (TPU) kernels: limb-packed field arithmetic, NTT, SHA-256.

All kernels are bit-exact with the host oracle in fields/ and poly/; they are
engaged automatically for large problem sizes and can be forced on/off via
``ministark_tpu.ops.set_device_enabled``.
"""

_DEVICE_ENABLED = True


def set_device_enabled(flag: bool) -> None:
    global _DEVICE_ENABLED
    _DEVICE_ENABLED = flag


def device_enabled() -> bool:
    return _DEVICE_ENABLED
