from .table import ascii_table
from .cli import str2bool

__all__ = ["ascii_table", "str2bool"]
