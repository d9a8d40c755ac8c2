"""CLI entry points preserving the reference's getopt flag surface."""
