from .variant import VariantBubble
from .graph import ChromosomeGraph
from .builder import PanelBuilder
