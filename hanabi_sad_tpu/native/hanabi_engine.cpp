// Native Hanabi engine: an independent C++ implementation of the game rules
// and canonical observation encoder, used as a differential-testing oracle
// for the JAX engine (tests/test_native_parity.py) and as a fast host-side
// debugging tool.
//
// This is a clean-room implementation from the same written spec as the JAX
// engine (SURVEY.md §2.8-2.9: the hle::HanabiState / CanonicalObservationEncoder
// behavior reconstructed from its call sites in /root/reference/cpp). It is
// exposed through a plain C ABI consumed via ctypes (bindings.py).
//
// Build: make -C hanabi_sad_tpu/native   (produces libhanabi_native.so)

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kColors = 5;
constexpr int kRanks = 5;
constexpr int kNumCards = kColors * kRanks;
constexpr int kDeckSize = 50;
constexpr int kMaxInfo = 8;
constexpr int kMaxLife = 3;
constexpr int kCopies[kRanks] = {3, 2, 2, 2, 1};

// move-type enum shared with the Python side (game/state.py)
enum MoveType { kDiscard = 0, kPlay = 1, kRevealColor = 2, kRevealRank = 3, kNoOp = 4, kNone = 5 };

struct LastAction {
  int move_type = kNone;
  int player = -1;
  int target = -1;
  int color = -1;
  int rank = -1;
  std::array<bool, 5> reveal_mask{};
  int position = -1;
  int card = -1;
  bool scored = false;
  bool info_add = false;
};

struct Slot {
  int card = -1;
  std::array<bool, kColors> color_plausible;
  std::array<bool, kRanks> rank_plausible;
  std::array<bool, kColors> color_hinted;
  std::array<bool, kRanks> rank_hinted;
  void reset_knowledge() {
    color_plausible.fill(true);
    rank_plausible.fill(true);
    color_hinted.fill(false);
    rank_hinted.fill(false);
  }
};

struct Game {
  int players = 2;
  int hand_size = 5;
  int bomb = 0;

  std::array<int, kDeckSize> deck{};
  int deck_ptr = 0;
  std::vector<std::vector<Slot>> hands;  // [P][H], compact prefix
  std::array<int, kColors> fireworks{};
  int info = kMaxInfo;
  int life = kMaxLife;
  std::array<std::array<int, kRanks>, kColors> discards{};
  int cur_player = 0;
  int turns_left = 0;
  LastAction last;
  bool terminal = false;

  int num_actions() const { return 2 * hand_size + (players - 1) * (kColors + kRanks) + 1; }
  int no_op_uid() const { return num_actions() - 1; }

  int hand_len(int p) const {
    int n = 0;
    for (const auto& s : hands[p])
      if (s.card >= 0) n++;
    return n;
  }

  int score() const {
    if (life <= 0) return 0;
    int s = 0;
    for (int c = 0; c < kColors; ++c) s += fireworks[c];
    return s;
  }
};

void deal(Game& g) {
  g.hands.assign(g.players, std::vector<Slot>(g.hand_size));
  for (int p = 0; p < g.players; ++p)
    for (int h = 0; h < g.hand_size; ++h) {
      g.hands[p][h].card = g.deck[g.deck_ptr++];
      g.hands[p][h].reset_knowledge();
    }
  g.info = kMaxInfo;
  g.life = kMaxLife - g.bomb;
  g.fireworks.fill(0);
  for (auto& c : g.discards) c.fill(0);
  g.cur_player = 0;
  g.turns_left = g.players;
  g.last = LastAction();
  g.terminal = false;
}

struct Move {
  int type, position, target_offset, color, rank;
};

Move decode_uid(const Game& g, int uid) {
  const int H = g.hand_size;
  Move m{kNoOp, 0, 1, 0, 0};
  if (uid < H) {
    m = {kDiscard, uid, 1, 0, 0};
  } else if (uid < 2 * H) {
    m = {kPlay, uid - H, 1, 0, 0};
  } else if (uid < 2 * H + (g.players - 1) * kColors) {
    int off = uid - 2 * H;
    m = {kRevealColor, 0, 1 + off / kColors, off % kColors, 0};
  } else if (uid < g.num_actions() - 1) {
    int off = uid - 2 * H - (g.players - 1) * kColors;
    m = {kRevealRank, 0, 1 + off / kRanks, 0, off % kRanks};
  }
  return m;
}

void legal_moves(const Game& g, int player, uint8_t* out) {
  std::memset(out, 0, g.num_actions());
  if (g.terminal || player != g.cur_player) {
    out[g.no_op_uid()] = 1;
    return;
  }
  const int H = g.hand_size;
  bool any = false;
  for (int i = 0; i < H; ++i) {
    bool occ = g.hands[player][i].card >= 0;
    if (occ && g.info < kMaxInfo) { out[i] = 1; any = true; }
    if (occ) { out[H + i] = 1; any = true; }
  }
  if (g.info > 0) {
    for (int off = 1; off < g.players; ++off) {
      int t = (player + off) % g.players;
      for (const auto& s : g.hands[t]) {
        if (s.card < 0) continue;
        int base_c = 2 * H + (off - 1) * kColors + s.card / kRanks;
        int base_r = 2 * H + (g.players - 1) * kColors + (off - 1) * kRanks + s.card % kRanks;
        out[base_c] = 1;
        out[base_r] = 1;
        any = true;
      }
    }
  }
  if (!any) out[g.no_op_uid()] = 1;
}

LastAction move_outcome(const Game& g, const Move& m) {
  LastAction la;
  la.move_type = m.type;
  la.player = g.cur_player;
  int target = (g.cur_player + m.target_offset) % g.players;
  bool is_pd = m.type == kPlay || m.type == kDiscard;
  bool is_reveal = m.type == kRevealColor || m.type == kRevealRank;
  if (is_pd) {
    la.position = m.position;
    la.card = g.hands[g.cur_player][m.position].card;
    if (m.type == kPlay && la.card >= 0) {
      int c = la.card / kRanks, r = la.card % kRanks;
      la.scored = g.fireworks[c] == r;
      la.info_add = la.scored && r == kRanks - 1 && g.info < kMaxInfo;
    }
  }
  if (is_reveal) {
    la.target = target;
    if (m.type == kRevealColor) la.color = m.color;
    if (m.type == kRevealRank) la.rank = m.rank;
    for (int i = 0; i < g.hand_size; ++i) {
      int card = g.hands[target][i].card;
      if (card < 0) continue;
      if (m.type == kRevealColor && card / kRanks == m.color) la.reveal_mask[i] = true;
      if (m.type == kRevealRank && card % kRanks == m.rank) la.reveal_mask[i] = true;
    }
  }
  return la;
}

void apply_move(Game& g, const Move& m) {
  if (g.terminal) return;
  LastAction la = move_outcome(g, m);

  if (g.deck_ptr >= kDeckSize) g.turns_left--;

  int player = g.cur_player;
  if (m.type == kPlay || m.type == kDiscard) {
    int card = la.card;
    int c = card >= 0 ? card / kRanks : 0, r = card >= 0 ? card % kRanks : 0;
    if (m.type == kPlay && card >= 0) {
      if (la.scored) {
        g.fireworks[c]++;
        if (la.info_add) g.info = std::min(g.info + 1, kMaxInfo);
      } else {
        g.life--;
        g.discards[c][r]++;
      }
    } else if (m.type == kDiscard && card >= 0) {
      g.discards[c][r]++;
      g.info = std::min(g.info + 1, kMaxInfo);
    }
    // remove + shift left
    auto& hand = g.hands[player];
    for (int i = m.position; i + 1 < g.hand_size; ++i) hand[i] = hand[i + 1];
    hand[g.hand_size - 1].card = -1;
    // draw to the end
    if (g.deck_ptr < kDeckSize) {
      int slot = g.hand_len(player);
      hand[slot].card = g.deck[g.deck_ptr++];
      hand[slot].reset_knowledge();
    }
  } else if (m.type == kRevealColor || m.type == kRevealRank) {
    g.info--;
    int target = (player + m.target_offset) % g.players;
    for (auto& s : g.hands[target]) {
      if (s.card < 0) continue;
      if (m.type == kRevealColor) {
        bool match = s.card / kRanks == m.color;
        for (int c = 0; c < kColors; ++c)
          s.color_plausible[c] = s.color_plausible[c] && (match ? c == m.color : c != m.color);
        if (match) s.color_hinted[m.color] = true;
      } else {
        bool match = s.card % kRanks == m.rank;
        for (int r = 0; r < kRanks; ++r)
          s.rank_plausible[r] = s.rank_plausible[r] && (match ? r == m.rank : r != m.rank);
        if (match) s.rank_hinted[m.rank] = true;
      }
    }
  }

  g.last = la;
  g.cur_player = (player + 1) % g.players;
  g.terminal = g.life <= 0 || g.score() >= kNumCards || g.turns_left <= 0;
}

// ---------------- canonical encoder ----------------

void encode_last_action(const Game& g, const LastAction& la, int observer, float* out, int* pos_io) {
  int pos = *pos_io;
  const int P = g.players, H = g.hand_size;
  bool valid = la.move_type < 4;
  // acting player (relative)
  for (int p = 0; p < P; ++p)
    out[pos + p] = (valid && (la.player - observer + P) % P == p) ? 1.f : 0.f;
  pos += P;
  // move type one-hot: play, discard, reveal-color, reveal-rank
  out[pos + 0] = la.move_type == kPlay;
  out[pos + 1] = la.move_type == kDiscard;
  out[pos + 2] = la.move_type == kRevealColor;
  out[pos + 3] = la.move_type == kRevealRank;
  pos += 4;
  bool is_reveal = la.move_type == kRevealColor || la.move_type == kRevealRank;
  for (int p = 0; p < P; ++p)
    out[pos + p] = (is_reveal && (la.target - observer + P) % P == p) ? 1.f : 0.f;
  pos += P;
  for (int c = 0; c < kColors; ++c) out[pos + c] = la.color == c;
  pos += kColors;
  for (int r = 0; r < kRanks; ++r) out[pos + r] = la.rank == r;
  pos += kRanks;
  for (int i = 0; i < H; ++i) out[pos + i] = (is_reveal && la.reveal_mask[i]) ? 1.f : 0.f;
  pos += H;
  bool is_pd = la.move_type == kPlay || la.move_type == kDiscard;
  for (int i = 0; i < H; ++i) out[pos + i] = (is_pd && la.position == i) ? 1.f : 0.f;
  pos += H;
  for (int c = 0; c < kNumCards; ++c)
    out[pos + c] = (is_pd && la.card == c) ? 1.f : 0.f;
  pos += kNumCards;
  out[pos++] = la.scored ? 1.f : 0.f;
  out[pos++] = la.info_add ? 1.f : 0.f;
  *pos_io = pos;
}

// Full per-player observation (identity color permutation).
void encode_observation(const Game& g, int observer, float* out) {
  const int P = g.players, H = g.hand_size;
  int pos = 0;
  // hands: relative order, own hand zeroed; then missing-card bits
  for (int rp = 0; rp < P; ++rp) {
    int p = (observer + rp) % P;
    for (int i = 0; i < H; ++i) {
      for (int c = 0; c < kNumCards; ++c)
        out[pos + c] = (rp != 0 && g.hands[p][i].card == c) ? 1.f : 0.f;
      pos += kNumCards;
    }
  }
  for (int rp = 0; rp < P; ++rp) {
    int p = (observer + rp) % P;
    out[pos++] = g.hand_len(p) < H ? 1.f : 0.f;
  }
  // board
  int deck_rest = kDeckSize - g.deck_ptr;
  for (int i = 0; i < kDeckSize - P * H; ++i) out[pos++] = i < deck_rest ? 1.f : 0.f;
  for (int c = 0; c < kColors; ++c)
    for (int r = 0; r < kRanks; ++r) out[pos++] = g.fireworks[c] == r + 1 ? 1.f : 0.f;
  for (int i = 0; i < kMaxInfo; ++i) out[pos++] = i < g.info ? 1.f : 0.f;
  for (int i = 0; i < kMaxLife; ++i) out[pos++] = i < g.life ? 1.f : 0.f;
  // discards: per color, per rank thermometer of copies
  for (int c = 0; c < kColors; ++c)
    for (int r = 0; r < kRanks; ++r)
      for (int k = 0; k < kCopies[r]; ++k) out[pos++] = k < g.discards[c][r] ? 1.f : 0.f;
  // last action
  encode_last_action(g, g.last, observer, out, &pos);
  // card knowledge
  for (int rp = 0; rp < P; ++rp) {
    int p = (observer + rp) % P;
    for (int i = 0; i < H; ++i) {
      const Slot& s = g.hands[p][i];
      bool occ = s.card >= 0;
      for (int c = 0; c < kColors; ++c)
        for (int r = 0; r < kRanks; ++r)
          out[pos++] = (occ && s.color_plausible[c] && s.rank_plausible[r]) ? 1.f : 0.f;
      for (int c = 0; c < kColors; ++c) out[pos++] = (occ && s.color_hinted[c]) ? 1.f : 0.f;
      for (int r = 0; r < kRanks; ++r) out[pos++] = (occ && s.rank_hinted[r]) ? 1.f : 0.f;
    }
  }
}

void encode_own_hand_trinary(const Game& g, int player, float* out) {
  for (int i = 0; i < g.hand_size; ++i) {
    const Slot& s = g.hands[player][i];
    float* o = out + 3 * i;
    o[0] = o[1] = o[2] = 0.f;
    if (s.card < 0) continue;
    int c = s.card / kRanks, r = s.card % kRanks;
    if (r == g.fireworks[c]) o[0] = 1.f;
    else if (r < g.fireworks[c]) o[1] = 1.f;
    else o[2] = 1.f;
  }
}

}  // namespace

// ---------------- C ABI ----------------

extern "C" {

void* hanabi_new(int players, int hand_size, int bomb, const int* deck) {
  Game* g = new Game();
  g->players = players;
  g->hand_size = hand_size;
  g->bomb = bomb;
  std::copy(deck, deck + kDeckSize, g->deck.begin());
  g->deck_ptr = 0;
  deal(*g);
  return g;
}

void hanabi_free(void* h) { delete static_cast<Game*>(h); }

int hanabi_num_actions(void* h) { return static_cast<Game*>(h)->num_actions(); }

// Applies the uid for the current player. Returns the reward (score delta).
// SAD greedy channel: pass greedy_uid >= 0 to also record the greedy-move
// outcome on the pre-move state into the sad buffer (55 floats per player per
// observer handled in hanabi_encode_sad).
float hanabi_step(void* h, int uid) {
  Game& g = *static_cast<Game*>(h);
  int before = g.score();
  apply_move(g, decode_uid(g, uid));
  return float(g.score() - before);
}

// Record of applying `uid` greedily to the *current* state, encoded as the
// last-action block for `observer`. out: 2P+4+C+R+2H+25+2 floats.
void hanabi_greedy_channel(void* h, int uid, int observer, float* out) {
  Game& g = *static_cast<Game*>(h);
  LastAction la = move_outcome(g, decode_uid(g, uid));
  int pos = 0;
  encode_last_action(g, la, observer, out, &pos);
}

void hanabi_legal_moves(void* h, int player, uint8_t* out) {
  legal_moves(*static_cast<Game*>(h), player, out);
}

void hanabi_encode(void* h, int observer, float* out) {
  encode_observation(*static_cast<Game*>(h), observer, out);
}

void hanabi_own_hand(void* h, int player, float* out) {
  encode_own_hand_trinary(*static_cast<Game*>(h), player, out);
}

int hanabi_score(void* h) { return static_cast<Game*>(h)->score(); }
int hanabi_life(void* h) { return static_cast<Game*>(h)->life; }
int hanabi_info(void* h) { return static_cast<Game*>(h)->info; }
int hanabi_terminal(void* h) { return static_cast<Game*>(h)->terminal ? 1 : 0; }
int hanabi_cur_player(void* h) { return static_cast<Game*>(h)->cur_player; }
int hanabi_deck_left(void* h) { return kDeckSize - static_cast<Game*>(h)->deck_ptr; }
int hanabi_turns_left(void* h) { return static_cast<Game*>(h)->turns_left; }

}  // extern "C"
