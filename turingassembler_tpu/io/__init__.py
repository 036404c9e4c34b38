"""Graph and sequence I/O.

Keeps the reference's file formats byte-compatible so outputs can be
compared directly: the "asmg" binary graph (src/assembly_graph.c:1173-1355),
the headered FASTA (write_fasta :791), and GFA (write_gfa :860).
"""
