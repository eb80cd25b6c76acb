from .alignment import Alignment, Uniquify, open_maybe_compressed, read_alignment, seqs_to_codes
from .newick import parse_newick, print_newick

__all__ = ["Alignment", "Uniquify", "open_maybe_compressed", "read_alignment",
           "seqs_to_codes", "parse_newick", "print_newick"]
