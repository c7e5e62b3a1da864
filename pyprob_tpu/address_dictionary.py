"""Module-name parity shim (reference: pyprob/address_dictionary.py:6-37).

The implementation lives in ``pyprob_tpu.address`` alongside the address
extraction scheme; this module keeps ``pyprob_tpu.address_dictionary``
importable for code written against the reference layout.
"""

from .address import AddressDictionary

__all__ = ["AddressDictionary"]
