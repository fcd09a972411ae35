from .state_transition import state_transition_circuit
from .voter import VoterFlags, voter_circuit
