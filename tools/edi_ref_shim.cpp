// C shim over the reference edioutput classes so the test suite can compare
// our Python EDI wire format byte-for-byte.  Built into .scratch/ only.
#include <cstring>
#include <cstdint>
#include <vector>
#include "../../reference/contrib/edioutput/TagItems.h"
#include "../../reference/contrib/edioutput/TagPacket.h"
#include "../../reference/contrib/edioutput/AFPacket.h"
#include "../../reference/contrib/edioutput/PFT.h"

using namespace edi;

extern "C" {

// Assemble one tag packet (ptr+dsti+ssm+ODRa) like Outputs.cpp:214-257
int ref_tagpacket(const uint8_t* payload, size_t len,
                  int atstf, int utco_offset, uint32_t seconds, uint32_t tsta,
                  int16_t left, int16_t right, int dlfc_calls,
                  uint8_t* out, size_t outlen)
{
    TagStarPTR ptr("DSTI");
    TagDSTI dsti;
    dsti.stihf = false;
    dsti.atstf = atstf;
    dsti.rfadf = false;
    dsti.utco = utco_offset;
    dsti.seconds = seconds;
    dsti.tsta = tsta;
    for (int i = 0; i < dlfc_calls; i++) dsti.dlfc = (dsti.dlfc + 1) % 5000;
    TagSSm ssm;
    ssm.istd_data = payload;
    ssm.istd_length = len;
    TagODRAudioLevels lv(left, right);
    TagPacket tp(8);
    tp.tag_items.push_back(&ptr);
    tp.tag_items.push_back(&dsti);
    tp.tag_items.push_back(&ssm);
    tp.tag_items.push_back(&lv);
    auto v = tp.Assemble();
    if (v.size() > outlen) return -1;
    memcpy(out, v.data(), v.size());
    return (int)v.size();
}

int ref_afpacket(const uint8_t* payload, size_t len, uint16_t seq,
                 uint8_t* out, size_t outlen)
{
    AFPacketiser af;
    af.OverrideSeq(seq);
    TagPacket tp(0);
    tp.raw_tagpacket.assign(payload, payload + len);
    auto v = af.Assemble(tp);
    if (v.size() > outlen) return -1;
    memcpy(out, v.data(), v.size());
    return (int)v.size();
}

// returns number of fragments; fragments concatenated into out with sizes
int ref_pft(const uint8_t* af, size_t len, int m, uint16_t pseq,
            uint8_t* out, size_t outlen, int* sizes, int max_frags)
{
    edi::configuration_t conf;
    conf.verbose = false;
    conf.enable_pft = true;
    conf.fec = m;
    PFT pft(conf);
    pft.OverridePSeq(pseq);
    std::vector<uint8_t> p(af, af + len);
    auto frags = pft.Assemble(p);
    size_t off = 0;
    int n = 0;
    for (auto& f : frags) {
        if (n >= max_frags || off + f.size() > outlen) return -1;
        memcpy(out + off, f.data(), f.size());
        off += f.size();
        sizes[n++] = (int)f.size();
    }
    return n;
}

}
