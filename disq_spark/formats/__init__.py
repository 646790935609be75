"""Record codecs and physical-format machinery (SAM/BAM/VCF text+binary,
BGZF splittable compression)."""
