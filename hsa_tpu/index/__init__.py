"""Device-resident index layout and build drivers."""

from .layout import DeviceIndex, build_device_index  # noqa: F401
