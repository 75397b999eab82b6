"""Bridge namespace package (see ../README.md).

Being a REGULAR package (it has an __init__.py) this would normally
shadow every other ``google.*`` namespace-package portion on sys.path
(e.g. a google-cloud client's ``google/cloud``).  Merge those portions
into ``__path__`` so the bridge only ADDS google.protobuf and never
hides sibling google.* packages.
"""

import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _entry in _sys.path:
    _cand = _os.path.join(_entry or ".", "google")
    if (
        _os.path.isdir(_cand)
        and _os.path.abspath(_cand) != _here
        and not _os.path.isfile(_os.path.join(_cand, "__init__.py"))
    ):
        if _cand not in __path__:
            __path__.append(_cand)
