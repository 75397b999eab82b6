"""google.protobuf bridged to the system Google Cloud SDK's bundled
pure-Python protobuf 6.32.0 runtime (see ../../README.md).  Our
directory stays FIRST on __path__ so the local runtime_version shim
shadows the runtime's strict gencode==runtime gate."""

import os as _os

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
if not _os.path.isdir(_SDK):  # pragma: no cover - machine without the SDK
    raise ImportError(f"bridged protobuf runtime not found at {_SDK}")
__path__.append(_SDK)
with open(_os.path.join(_SDK, "__init__.py")) as _f:
    exec(_f.read())
