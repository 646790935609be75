"""DataFrame sources for genomics formats (SAM/BAM/VCF/CRAM)."""
