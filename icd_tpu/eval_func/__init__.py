from .bleu import Bleu
from .cider import Cider
from .meteor import Meteor
from .rouge import Rouge

__all__ = ["Bleu", "Cider", "Meteor", "Rouge"]
