"""Driver-side header sidecars for reads and variants datasets.

The reference reads the header once on the driver from the first file
(AbstractSamSource.java:54-71, VcfSource.java:75-83) and broadcasts it to
executors for encoding. Headers have no Catalyst representation, so we
carry them as small pickleable objects next to the DataFrame; they ride
to executors inside task closures (Spark broadcasts closures> 4MB-free).

Raw header text is kept verbatim for lossless round-trips; commonly
needed fields are parsed out.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SamHeader:
    """Parsed SAM/BAM header (@-lines, tab-separated fields)."""

    text: str = ""  # verbatim header text incl. trailing newline

    @property
    def lines(self) -> list[str]:
        return [ln for ln in self.text.splitlines() if ln]

    @property
    def sort_order(self) -> str:
        for ln in self.lines:
            if ln.startswith("@HD"):
                for f in ln.split("\t")[1:]:
                    if f.startswith("SO:"):
                        return f[3:]
        return "unknown"

    @property
    def sequences(self) -> list[tuple[str, int]]:
        """Sequence dictionary [(name, length)] from @SQ lines, file order."""
        out = []
        for ln in self.lines:
            if ln.startswith("@SQ"):
                name, length = None, None
                for f in ln.split("\t")[1:]:
                    if f.startswith("SN:"):
                        name = f[3:]
                    elif f.startswith("LN:"):
                        length = int(f[3:])
                if name is not None:
                    out.append((name, length or 0))
        return out

    @property
    def read_groups(self) -> list[str]:
        out = []
        for ln in self.lines:
            if ln.startswith("@RG"):
                for f in ln.split("\t")[1:]:
                    if f.startswith("ID:"):
                        out.append(f[3:])
        return out

    def contig_index(self) -> dict[str, int]:
        return {name: i for i, (name, _len) in enumerate(self.sequences)}

    def libraries(self) -> dict[str, str]:
        """@RG ID -> LB map (Picard's duplicate-detection unit: many
        lanes/read groups of one library dedup as a single pool)."""
        out: dict[str, str] = {}
        for ln in self.lines:
            if ln.startswith("@RG"):
                rid = lb = None
                for f in ln.split("\t")[1:]:
                    if f.startswith("ID:"):
                        rid = f[3:]
                    elif f.startswith("LB:"):
                        lb = f[3:]
                if rid is not None:
                    out[rid] = lb if lb is not None else "Unknown Library"
        return out


@dataclass
class VcfHeader:
    """Parsed VCF header (## meta lines + #CHROM line)."""

    text: str = ""  # verbatim, incl. the #CHROM line and trailing newline
    samples: list[str] = field(default_factory=list)

    @classmethod
    def from_lines(cls, lines: list[str]) -> "VcfHeader":
        samples: list[str] = []
        for ln in lines:
            if ln.startswith("#CHROM"):
                cols = ln.rstrip("\n").split("\t")
                if len(cols) > 9:
                    samples = cols[9:]
        text = "".join(ln if ln.endswith("\n") else ln + "\n" for ln in lines)
        return cls(text=text, samples=samples)

    @property
    def lines(self) -> list[str]:
        return [ln for ln in self.text.splitlines() if ln]

    @property
    def contigs(self) -> list[str]:
        out = []
        for ln in self.lines:
            if ln.startswith("##contig="):
                body = ln[len("##contig=<") : -1] if ln.endswith(">") else ""
                for f in body.split(","):
                    if f.startswith("ID="):
                        out.append(f[3:])
        return out
